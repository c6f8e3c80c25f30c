package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.LakeLayout
import graft.streaming.SensorStreamJob

/** Streaming MERGE sink: micro-batches upsert by key instead of
  * appending, so the table always holds the latest version of each key
  * (the streaming twin of the K4 silver merge). */
class UpsertSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert sink keeps latest-by-key across micro-batches") {
    val root = Files.createTempDirectory("graft-upsert").toString
    val layout = LakeLayout(root)
    val out = s"$root/state"
    val ckpt = s"$root/ckpt"
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF().toDF("pool_id", "status", "seq")
    val q = SensorStreamJob.startUpsertSink(stream, layout, out,
      keys = Seq("pool_id"), orderCol = "seq", checkpointPath = ckpt)
    try {
      mem.addData((1L, "FILLING", 1L), (2L, "OK", 2L))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 2)

      // batch 2 updates pool 1 (twice — latest inside the batch wins)
      // and inserts pool 3
      mem.addData((1L, "OK", 3L), (1L, "DRAINING", 4L), (3L, "NEW", 5L))
      q.processAllAvailable()
      val rows = spark.read.parquet(out)
        .orderBy("pool_id").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq ==
        Seq((1L, "DRAINING"), (2L, "OK"), (3L, "NEW")))
    } finally q.stop()
  }

  test("re-merging an applied batch is a no-op (replay idempotence)") {
    val root = Files.createTempDirectory("graft-upsert2").toString
    val layout = LakeLayout(root)
    val out = s"$root/state"
    // simulate the replay directly: apply the same merge twice
    val target = Seq((1L, "OK", 3L), (2L, "OK", 2L))
      .toDF("pool_id", "status", "seq")
    graft.core.TableIO.overwrite(target, layout, out)
    val batch = Seq((1L, "OK", 3L)).toDF("pool_id", "status", "seq")
    def applyOnce(): Unit = {
      val t = graft.core.TableIO.read(spark, layout, out)
      graft.core.TableIO.replaceContents(spark, layout,
        graft.ops.Upsert(t, batch, Seq("pool_id"),
          Seq(col("seq").desc)), out)
    }
    applyOnce()
    val first = spark.read.parquet(out).orderBy("pool_id").collect().toSeq
    applyOnce()
    val second = spark.read.parquet(out).orderBy("pool_id").collect().toSeq
    assert(first == second && first.size == 2)
  }
}
