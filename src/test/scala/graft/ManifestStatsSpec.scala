package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.ManifestStats

/** File-skipping manifest: stats are exact per file, pruning touches
  * only envelope-intersecting files, and pruned results equal the
  * full-scan results for the same predicate.
  */
class ManifestStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def mkTable(): String = {
    val dir = Files.createTempDirectory("manifest").toString
    // three disjoint key ranges → three files (one partition each)
    Seq((0, 100), (100, 200), (200, 300)).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        (lo until hi).map(k => (k.toLong, f"k$k%03d", s"part$i"))
          .toDF("id", "key", "part")
          .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  test("build: one stats row per (file, column), exact envelopes") {
    val dir = mkTable()
    val m = ManifestStats.build(spark, dir, Seq("key", "id"))
    assert(m.select("file").distinct().count() == 3)
    assert(m.count() == 6) // 3 files × 2 columns
    val keyRows = m.filter(col("col_name") === "key")
      .orderBy("min_value").collect()
    assert(keyRows.map(_.getAs[String]("min_value")).toSeq ==
      Seq("k000", "k100", "k200"))
    assert(keyRows.map(_.getAs[String]("max_value")).toSeq ==
      Seq("k099", "k199", "k299"))
    assert(keyRows.forall(_.getAs[Long]("n_nulls") == 0L))
    assert(keyRows.forall(_.getAs[Long]("n_rows") == 100L))
  }

  test("pruneFiles touches only envelope-intersecting files") {
    val dir = mkTable()
    val m = ManifestStats.build(spark, dir, Seq("key"))
    // point-ish range inside file 2's envelope
    val hit = ManifestStats.pruneFiles(m, "key", "k150", "k160")
    assert(hit.size == 1)
    // range spanning the 1st/2nd boundary
    assert(ManifestStats.pruneFiles(m, "key", "k090", "k110").size == 2)
    // out-of-range probe touches nothing
    assert(ManifestStats.pruneFiles(m, "key", "k900", "k999").isEmpty)
  }

  test("readPruned + row predicate ≡ full scan + row predicate") {
    val dir = mkTable()
    val m = ManifestStats.build(spark, dir, Seq("key"))
    val pred = col("key").between("k150", "k160")
    val pruned = ManifestStats.readPruned(spark, m, "key", "k150", "k160")
      .filter(pred).select("id").as[Long].collect().sorted
    val full = spark.read.parquet(dir)
      .filter(pred).select("id").as[Long].collect().sorted
    assert(pruned.sameElements(full) && full.length == 11)
  }

  test("all-pruned read keeps the table schema so filters resolve") {
    val dir = mkTable()
    val m = ManifestStats.build(spark, dir, Seq("key"))
    // out-of-range probe: zero files survive, but the caller's
    // documented follow-up row-predicate must still resolve
    val out = ManifestStats.readPruned(spark, m, "key", "k900", "k999")
      .filter(col("key").between("k900", "k999"))
    assert(out.columns.toSet == Set("id", "key", "part"))
    assert(out.count() == 0L)
  }

  test("all-null stats rows are skipped by range pruning") {
    val dir = Files.createTempDirectory("manifest_null").toString
    Seq((1L, Option.empty[String])).toDF("id", "key")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((2L, Some("b"))).toDF("id", "key")
      .coalesce(1).write.mode("append").parquet(dir)
    val m = ManifestStats.build(spark, dir, Seq("key"))
    assert(ManifestStats.pruneFiles(m, "key", "a", "z").size == 1)
  }
}
