package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline. Media are opaque `binary` columns with typed metadata; the
  * Spark-side concerns — schema, partitioning, batch iteration shape,
  * deterministic feature output — are real and tested. The actual codec
  * work is STUBBED (this container has no image/audio libraries): the
  * stub derives deterministic pseudo-features from the bytes, so tests
  * exercise the full distributed path end-to-end.
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

  /** STUB decode: ??? in a real deployment this calls the image/audio
    * codec; here it derives `dim` deterministic floats from a rolling
    * checksum of the bytes so the distributed plumbing is testable. */
  private[multimodal] def stubFeature(bytes: Array[Byte], dim: Int)
      : Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null) return out
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    var d = 0
    while (d < dim) {
      out(d) = out(d) + ((h >>> (d % 60)) & 0x7) * 1e-3f
      d += 1
    }
    out
  }

  /** Distributed feature extraction: binary assets → fixed-dim float
    * features, one partition-at-a-time (per-partition init amortized). */
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
        // real impl: initialize codec/model HERE, once per partition
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("media_bytes")
          Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"),
            if (bytes == null) 0L else bytes.length.toLong,
            stubFeature(bytes, dim).toIndexedSeq)
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
}
