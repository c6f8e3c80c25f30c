package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.VersionedTable
import graft.ops.IncrementalAgg

/** Incremental aggregate maintenance: the delta path must be
  * indistinguishable from recompute, take the cheap path exactly when
  * the lineage allows it, and fall back honestly when it doesn't. */
class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("incagg").toString
    graft.core.Scratch.registerForCleanup(d)
    d
  }

  private def recompute(basePath: String): DataFrame =
    VersionedTable.read(spark, basePath)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col("v"), lit(0L))).as("sum_val"))

  private def asMap(df: DataFrame): Map[Option[String], (Long, Long)] =
    df.collect().map(r => (Option(r.getAs[String]("k")),
      (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_val")))).toMap

  test("init, incremental appends, noop — modes and values") {
    val root = tmp()
    val (base, agg) = (s"$root/base", s"$root/agg")
    VersionedTable.commitAppend(
      Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v"), base)
    val r1 = IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    assert(r1.mode === "init")
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("a") -> ((2L, 3L)), Some("b") -> ((1L, 10L))))

    VersionedTable.commitAppend(
      Seq(("b", 5L), ("c", 7L)).toDF("k", "v"), base)
    val r2 = IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    assert(r2.mode === "incremental")
    assert(r2.filesScanned > 0 &&
      r2.filesScanned < VersionedTable.files(spark, base).size,
      "delta refresh must scan only the appended files")
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("a") -> ((2L, 3L)), Some("b") -> ((2L, 15L)),
        Some("c") -> ((1L, 7L))))

    val r3 = IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    assert(r3.mode === "noop" && r3.filesScanned === 0)
  }

  test("null keys and null values merge correctly") {
    val root = tmp()
    val (base, agg) = (s"$root/base", s"$root/agg")
    VersionedTable.commitAppend(Seq(
      (Option("a"), Option(1L)), (Option.empty[String], Option(4L)),
      (Option("a"), Option.empty[Long])).toDF("k", "v"), base)
    IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    VersionedTable.commitAppend(Seq(
      (Option.empty[String], Option(6L)),
      (Option.empty[String], Option.empty[Long])).toDF("k", "v"), base)
    val r = IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    assert(r.mode === "incremental")
    // the NULL-keyed group must merge into ONE row (null-safe match),
    // null values count rows but add 0
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("a") -> ((2L, 1L)), None -> ((3L, 10L))))
  }

  test("overwrite lineage falls back to full recompute") {
    val root = tmp()
    val (base, agg) = (s"$root/base", s"$root/agg")
    VersionedTable.commitAppend(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), base)
    IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    VersionedTable.commitOverwrite(Seq(("c", 9L)).toDF("k", "v"), base)
    val r = IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    assert(r.mode === "full")
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("c") -> ((1L, 9L))))
  }

  test("merge lineage (rewrites files) falls back and stays correct") {
    val root = tmp()
    val (base, agg) = (s"$root/base", s"$root/agg")
    VersionedTable.commitAppend(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), base)
    IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    VersionedTable.commitMerge(
      Seq(("b", 20L)).toDF("k", "v"), base, Seq("k"))
    val r = IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    assert(r.mode === "full")
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("a") -> ((1L, 1L)), Some("b") -> ((1L, 20L))))
  }

  test("restore moving the base backward recomputes") {
    val root = tmp()
    val (base, agg) = (s"$root/base", s"$root/agg")
    VersionedTable.commitAppend(Seq(("a", 1L)).toDF("k", "v"), base)
    VersionedTable.commitAppend(Seq(("b", 2L)).toDF("k", "v"), base)
    IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    // restore to v1 — a new version whose file set does NOT contain
    // the reflected version's files
    VersionedTable.restore(spark, base, 1)
    val r = IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    assert(r.mode === "full")
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("a") -> ((1L, 1L))))
  }

  test("double value column is rejected (order-free sums only)") {
    val root = tmp()
    val (base, agg) = (s"$root/base", s"$root/agg")
    VersionedTable.commitAppend(Seq(("a", 1.5)).toDF("k", "v"), base)
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("streaming foreachBatch: exactly-once under replay, crash-safe") {
    val root = tmp()
    val (base, agg) = (s"$root/base", s"$root/agg")
    val sink = IncrementalAgg.foreachBatchMaintain(
      base, agg, Seq("k"), "v")
    sink(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), 0L)
    sink(Seq(("a", 10L)).toDF("k", "v"), 1L)
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("a") -> ((2L, 11L)), Some("b") -> ((1L, 2L))))
    // replay of batch 1 (checkpoint recovery re-delivers): the commit
    // marker skips the append and maintain no-ops — no double count
    sink(Seq(("a", 10L)).toDF("k", "v"), 1L)
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("a") -> ((2L, 11L)), Some("b") -> ((1L, 2L))))
    // crash between append and maintain: batch 2 lands in the base
    // only; the NEXT batch's maintain must fold BOTH versions in
    VersionedTable.foreachBatchAppend(base)(
      Seq(("c", 5L)).toDF("k", "v"), 2L)
    sink(Seq(("b", 3L)).toDF("k", "v"), 3L)
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("a") -> ((2L, 11L)), Some("b") -> ((2L, 5L)),
        Some("c") -> ((1L, 5L))))
  }

  test("streaming foreachBatch: live MemoryStream end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp()
    val (base, agg) = (s"$root/base", s"$root/agg")
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(IncrementalAgg.foreachBatchMaintain(
        base, agg, Seq("k"), "v"))
      .start()
    try {
      in.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()
      in.addData(("b", 8L)); q.processAllAvailable()
      assert(asMap(IncrementalAgg.read(spark, agg)) ===
        asMap(recompute(base)))
      assert(asMap(IncrementalAgg.read(spark, agg)) ===
        Map(Some("a") -> ((1L, 1L)), Some("b") -> ((2L, 10L))))
    } finally q.stop()
  }

  test("maintains over a shallow clone: nesting holds across roots") {
    val root = tmp()
    val (src, cl, agg) = (s"$root/src", s"$root/clone", s"$root/agg")
    VersionedTable.commitAppend(
      Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), src)
    VersionedTable.cloneFrom(spark, src, cl)
    IncrementalAgg.maintain(spark, cl, agg, Seq("k"), "v")
    // the clone's next append nests over manifests whose carried
    // files live under the SOURCE's data dir — the delta path must
    // still detect nesting (paths are absolute) and scan only the
    // clone-local new files
    VersionedTable.commitAppend(Seq(("b", 5L)).toDF("k", "v"), cl)
    val r = IncrementalAgg.maintain(spark, cl, agg, Seq("k"), "v")
    assert(r.mode === "incremental")
    assert(asMap(IncrementalAgg.read(spark, agg)) ===
      Map(Some("a") -> ((1L, 1L)), Some("b") -> ((2L, 7L))))
  }

  test("property: any append sequence equals recompute") {
    val batchGen = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n,
      for {
        k <- Gen.oneOf("a", "b", "c", "d")
        v <- Gen.choose(-50L, 50L)
      } yield (k, v)))
    val seqGen = Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, batchGen))
    for (i <- 0 until 8) {
      val batches = seqGen.pureApply(Gen.Parameters.default, Seed(i))
      val root = tmp()
      val (base, agg) = (s"$root/base", s"$root/agg")
      batches.foreach { b =>
        VersionedTable.commitAppend(
          spark.createDataFrame(b).toDF("k", "v"), base)
        IncrementalAgg.maintain(spark, base, agg, Seq("k"), "v")
      }
      if (batches.exists(_.nonEmpty))
        assert(asMap(IncrementalAgg.read(spark, agg)) ===
          asMap(recompute(base)), s"seed=$i batches=$batches")
    }
  }
}
