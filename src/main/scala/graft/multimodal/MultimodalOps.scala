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

  /** Deterministic synthetic asset table for tests/demos. */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val modality = Seq("image", "audio", "video")(i % 3)
      val bytes = Array.tabulate[Byte](64 + (i % 128))(j =>
        ((i * 31 + j * 7) % 251).toByte)
      (i.toLong, modality, bytes,
        Some(s"application/x-$modality"),
        if (modality == "image") Some(640) else None,
        if (modality == "image") Some(480) else None,
        if (modality == "video") Some(5000L + i) else None)
    }
    rows.toDF("asset_id", "modality", "media_bytes", "mime_type",
      "width", "height", "duration_ms")
  }
}
