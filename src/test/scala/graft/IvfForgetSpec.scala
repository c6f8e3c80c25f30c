package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.VersionedTable
import graft.operators.IvfIndex

/** Dense-side takedown: tombstoned vectors never surface, search
  * equals an index that never admitted them, and the drift retrain
  * physically purges them. */
class IvfForgetSpec extends SparkTestBase {
  import spark.implicits._

  // 40 deterministic 8-dim vectors; ids 0..39. Forgotten ids are kept
  // OUT of the first-16 codebook seed so a never-admitted index has
  // the identical codebook and results compare bit-for-bit
  private def vec(i: Long): Seq[Double] =
    (0 until 8).map(d => math.sin(i * 17.0 + d * 3.0) + (i % 5) * 0.1)
  private val corpus = (0L until 40L).map(i => (i, vec(i)))
    .toDF("vec_id", "vec")
  private val qs = (0L until 5L).map(i => (i + 100L, vec(i * 7 + 1)))
    .toDF("query_id", "qvec")
  private val forgotten = Seq(20L, 25L, 33L)

  private def fresh(docs: DataFrame): String = {
    val path = graft.core.Scratch.root(docs) +
      s"/ivffgt_${java.util.UUID.randomUUID()}"
    graft.core.Scratch.registerForCleanup(path)
    IvfIndex.publish(docs, "vec_id", "vec", path)
    path
  }

  private def rows(df: DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e9) / 1e9, r.getInt(3))).toSeq.sorted

  private def search(path: String) = rows(IvfIndex.searchFrom(
    spark, path, qs, "query_id", "qvec", "vec_id", k = 5,
    excludeSelf = false))

  test("forget equals an index that never admitted the vectors") {
    val path = fresh(corpus)
    IvfIndex.forget(spark, path,
      forgotten.toDF("vec_id"), "vec_id")
    val got = search(path)
    assert(!got.exists(r => forgotten.contains(r._2)))
    val never = fresh(corpus.filter(!$"vec_id".isin(forgotten: _*)))
    assert(got === search(never))
    // merge-on-read: assignments were not rewritten
    assert(VersionedTable.latestVersion(spark, s"$path/assigned") === 1)
  }

  test("forget is idempotent; unknown ids ignored") {
    val path = fresh(corpus)
    IvfIndex.forget(spark, path, Seq(20L).toDF("vec_id"), "vec_id")
    val after = search(path)
    IvfIndex.forget(spark, path,
      Seq(20L, 999L).toDF("vec_id"), "vec_id")
    assert(search(path) === after)
    assert(VersionedTable.read(spark, s"$path/deletes").count() === 1L)
  }

  test("explicit purge without a drift retrain; idempotent") {
    val path = fresh(corpus)
    IvfIndex.forget(spark, path, forgotten.toDF("vec_id"), "vec_id")
    val after = search(path)
    assert(IvfIndex.purgeForgotten(spark, path, opId = 1L))
    assert(search(path) === after)
    assert(VersionedTable.read(spark, s"$path/assigned")
      .filter($"vec_id".isin(forgotten: _*)).count() === 0L)
    assert(VersionedTable.read(spark, s"$path/deletes").count() === 0L)
    assert(!IvfIndex.purgeForgotten(spark, path, opId = 2L))
  }

  test("drift retrain purges tombstones physically") {
    val path = fresh(corpus)
    IvfIndex.forget(spark, path,
      forgotten.toDF("vec_id"), "vec_id")
    // force a PSI breach with a shifted batch through the drift-aware
    // sink (threshold 0 → any batch breaches); seeding happens on the
    // upgrade path since publish() predates the sink here
    val sink = IvfIndex.foreachBatchIngestDriftAware(
      path, "vec_id", "vec", cells = 16, trainIters = 1,
      psiThreshold = 0.0)
    val shifted = (200L until 210L)
      .map(i => (i, (0 until 8).map(d => 9.0 + d * 0.01 + i * 0.001)))
      .toDF("vec_id", "vec")
    sink(shifted, 1L)
    // tombstoned ids are gone from the rebuilt assignments and the
    // deletes table reset
    val assigned = VersionedTable.read(spark, s"$path/assigned")
    assert(assigned.filter($"vec_id".isin(forgotten: _*)).count() === 0L)
    assert(VersionedTable.read(spark, s"$path/deletes").count() === 0L)
    // and they stay gone from search
    assert(!search(path).exists(r => forgotten.contains(r._2)))
  }
}
