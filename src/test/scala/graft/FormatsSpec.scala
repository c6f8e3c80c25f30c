package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.{LakeLayout, TableIO}

/** Source/sink format coverage: the LakeLayout format is pluggable
  * (parquet in this environment, delta when its jars ship); every
  * built-in columnar/text format round-trips through TableIO. The
  * four streaming sinks and JDBC are covered in StreamResumeSpec /
  * JdbcIngestSpec.
  */
class FormatsSpec extends SparkTestBase {
  import spark.implicits._

  private val data = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null, 0.0))

  for (fmt <- Seq("parquet", "orc", "json", "csv")) {
    test(s"$fmt round-trips through TableIO") {
      val root = Files.createTempDirectory(s"graft-fmt-$fmt").toString
      val layout = LakeLayout(root, format = fmt)
      val df = data.toDF("id", "s", "v")
      TableIO.overwrite(df, layout, s"$root/t")
      val back = fmt match {
        // text formats need schema/header help on read
        case "csv" => spark.read.option("header", "false")
          .schema("id BIGINT, s STRING, v DOUBLE").csv(s"$root/t")
        case "json" => spark.read
          .schema("id BIGINT, s STRING, v DOUBLE").json(s"$root/t")
        case _ => TableIO.read(spark, layout, s"$root/t")
      }
      assert(back.count() == 3)
      assert(back.select(sum(col("v"))).as[Double].head() == 4.0)
      assert(back.filter(col("s").isNull).count() == 1)
    }
  }

  test("spark-submit arg surface parses like the reference CLIs") {
    val a = graft.batch.JobMains.parseArgs(Array(
      "--lake-root", "/tmp/x", "--ingest-date", "2026-01-15",
      "--upsert", "false"))
    assert(a == Map("lake-root" -> "/tmp/x",
      "ingest-date" -> "2026-01-15", "upsert" -> "false"))
  }
}
