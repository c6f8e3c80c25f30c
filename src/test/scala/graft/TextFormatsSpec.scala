package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.TextFormats

/** JSONL / ORC ingestion: corrupt-record quarantine, null and unicode
  * round-trips, missing/extra-field schema compatibility, and ORC
  * predicate pushdown. */
class TextFormatsSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType)))

  test("malformed lines are quarantined, never dropped or fatal") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"id": 1, "text": "ok"}
        |this is not json
        |{"id": 2, "text": "also ok"}
        |{"id": "not a long", "text": "type mismatch"}
        |""".stripMargin)
    val parsed = TextFormats.readJsonLines(spark, dir, schema)
    val good = TextFormats.goodRecords(parsed)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good === Set((1L, "ok"), (2L, "also ok")))
    val bad = TextFormats.badRecords(parsed)
      .collect().map(_.getString(0)).toSet
    assert(bad.size === 2)
    assert(bad.exists(_.contains("not json")))
    assert(bad.exists(_.contains("not a long")))
  }

  test("nulls, unicode, newlines and quotes round-trip byte-exactly") {
    val dir = Files.createTempDirectory("jsonl2").toString + "/t"
    val rows = Seq(
      (1L, Some("line1\nline2\t\"quoted\"")),
      (2L, Some("emoji 😀 and café")),
      (3L, None),
      (4L, Some("")))
    TextFormats.writeJsonLines(rows.toDF("id", "text"), dir)
    val back = TextFormats.goodRecords(
        TextFormats.readJsonLines(spark, dir, schema))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)))).toSet
    // Spark's JSON writer drops null fields from the object; the
    // explicit schema reads the absent field back as null — the same
    // row, which is the point
    assert(back === rows.toSet)
  }

  test("missing and extra fields follow the evolution contract") {
    val dir = Files.createTempDirectory("jsonl3").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0.json"),
      """{"id": 1}
        |{"id": 2, "text": "t", "extra_field": 99}
        |""".stripMargin)
    val good = TextFormats.goodRecords(
        TextFormats.readJsonLines(spark, dir, schema))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    // missing field -> null; unknown field -> ignored; neither is
    // corrupt
    assert(good === Set((1L, None), (2L, Some("t"))))
  }

  test("streaming JSONL: shards land across restarts, exactly once, " +
      "quarantine split") {
    val root = Files.createTempDirectory("jsonlstream").toString
    val (src, lake, quar, ckpt) =
      (s"$root/src", s"$root/lake", s"$root/quar", s"$root/ckpt")
    Files.createDirectories(java.nio.file.Paths.get(src))
    def land(name: String, lines: String): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$src/$name"), lines)

    val landGood = graft.core.VersionedTable.foreachBatchAppend(lake)
    val landBad = graft.core.VersionedTable.foreachBatchAppend(quar)
    def run(): Unit = {
      val q = TextFormats.streamJsonLines(spark, src, schema)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            id: Long) =>
          landGood(TextFormats.goodRecords(batch), id)
          val bad = TextFormats.badRecords(batch)
          if (!bad.isEmpty) landBad(bad, id)
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    land("shard-0.json", """{"id": 1, "text": "a"}
      |{"id": 2, "text": "b"}
      |""".stripMargin)
    run()
    // second shard lands AFTER a stop, with one corrupt line; the
    // restarted query must ingest only the new file (checkpointed
    // file tracking), split the bad line to quarantine, and never
    // re-land shard-0
    land("shard-1.json", """{"id": 3, "text": "c"}
      |garbage line
      |""".stripMargin)
    run()
    val lakeRows = graft.core.VersionedTable.read(spark, lake)
      .select("id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    assert(lakeRows === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    val quarRows = graft.core.VersionedTable.read(spark, quar)
      .collect().map(_.getString(0)).toSeq
    assert(quarRows === Seq("garbage line"))
    // replaying the stream with the same checkpoint is a no-op
    run()
    assert(graft.core.VersionedTable.read(spark, lake).count() === 3L)
  }

  test("ORC round-trips and pushes the filter into the scan") {
    val dir = Files.createTempDirectory("orc").toString + "/t"
    val df = (0L until 100L).map(i =>
      (i, s"doc $i", if (i % 10 == 0) None else Some(i * 3)))
      .toDF("id", "text", "score")
    TextFormats.writeOrc(df, dir)
    val q = TextFormats.readOrc(spark, dir).filter(col("id") >= 90L)
    assert(q.count() === 10L)
    // null column round-trip
    assert(TextFormats.readOrc(spark, dir)
      .filter(col("score").isNull).count() === 10L)
    // the predicate must reach the ORC scan as a pushed filter, not
    // hang above it as a post-scan-only filter
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }
    assert(scan.nonEmpty, "expected a FileSourceScanExec over ORC")
    assert(scan.get.metadata("PushedFilters").contains(
      "GreaterThanOrEqual(id,90)"),
      s"filter not pushed: ${scan.get.metadata("PushedFilters")}")
  }
}
