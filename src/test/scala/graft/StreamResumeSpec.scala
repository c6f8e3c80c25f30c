package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Checkpointed restart (SURVEY §2.9 lifecycle): the reference
  * relaunches its streaming job hourly and relies on the checkpoint to
  * resume offsets. Replicated with a file-stream source (S6 shape) and
  * a parquet sink: stop the query, land more data, restart with the
  * SAME checkpoint — every row delivered exactly once.
  */
class StreamResumeSpec extends SparkTestBase {
  import spark.implicits._

  test("restart from checkpoint is exactly-once across the stop") {
    val root = Files.createTempDirectory("graft-resume").toString
    val src = s"$root/src"
    val sink = s"$root/sink"
    val ckpt = s"$root/ckpt"
    val schema = StructType.fromDDL("id BIGINT, v STRING")

    def land(from: Int, until: Int): Unit =
      (from until until).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(src)

    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .withColumn("v2", upper(col("v")))
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", sink)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }

    land(0, 50)
    run()
    assert(spark.read.parquet(sink).count() == 50)

    land(50, 80) // lands while "down"
    run()        // resumes from the same checkpoint
    val out = spark.read.parquet(sink)
    assert(out.count() == 80, "rows lost or duplicated across restart")
    assert(out.select(countDistinct(col("id"))).as[Long].head() == 80)
    assert(out.filter(col("v2") === upper(col("v"))).count() == 80)
  }
}
