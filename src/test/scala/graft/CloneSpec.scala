package graft

import org.apache.spark.sql.functions._

import graft.core.VersionedTable

/** Shallow clone: zero-copy fork, independent evolution, and vacuum
  * isolation (cleaning a clone can never touch the source). */
class CloneSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("clone").toString
    graft.core.Scratch.registerForCleanup(d)
    d
  }

  test("clone reads the source version with zero bytes copied") {
    val root = tmp()
    val (src, cl) = (s"$root/src", s"$root/clone")
    VersionedTable.commitAppend(
      (0L until 100L).map(i => (i, s"p$i")).toDF("id", "p"), src)
    VersionedTable.commitAppend(
      (100L until 150L).map(i => (i, s"p$i")).toDF("id", "p"), src)
    val v = VersionedTable.cloneFrom(spark, src, cl)
    assert(v === 1)
    assert(VersionedTable.read(spark, cl).count() === 150L)
    // metadata-only: the clone has no data directory of its own
    val f = new org.apache.hadoop.fs.Path(cl).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$cl/data")))
    // pinned-version clone sees the older snapshot
    val cl2 = s"$root/clone2"
    VersionedTable.cloneFrom(spark, src, cl2, version = Some(1))
    assert(VersionedTable.read(spark, cl2).count() === 100L)
  }

  test("clone and source evolve independently after the fork") {
    val root = tmp()
    val (src, cl) = (s"$root/src", s"$root/clone")
    VersionedTable.commitAppend(Seq((1L, "a")).toDF("id", "p"), src)
    VersionedTable.cloneFrom(spark, src, cl)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("id", "p"), cl)
    VersionedTable.commitAppend(Seq((3L, "c")).toDF("id", "p"), src)
    assert(VersionedTable.read(spark, cl).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(VersionedTable.read(spark, src).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }

  test("vacuum on the clone never reclaims source bytes") {
    val root = tmp()
    val (src, cl) = (s"$root/src", s"$root/clone")
    VersionedTable.commitAppend(
      (0L until 50L).map(i => (i, i)).toDF("id", "v"), src)
    VersionedTable.cloneFrom(spark, src, cl)
    // the clone rewrites itself (compaction-style overwrite), then
    // vacuums away its own history — the source must be untouched
    VersionedTable.commitOverwrite(
      VersionedTable.read(spark, cl).filter($"id" < 10L), cl)
    VersionedTable.vacuum(spark, cl, retainLast = 1, graceMs = 0L)
    assert(VersionedTable.read(spark, cl).count() === 10L)
    assert(VersionedTable.read(spark, src).count() === 50L,
      "clone vacuum reclaimed source data files")
  }

  test("clone of a schema-evolved source keeps merging footers") {
    val root = tmp()
    val (src, cl) = (s"$root/src", s"$root/clone")
    VersionedTable.commitAppend(Seq((1L, "a")).toDF("id", "p"), src)
    VersionedTable.commitAppendEvolve(
      Seq((2L, "b", 9L)).toDF("id", "p", "extra"), src)
    VersionedTable.cloneFrom(spark, src, cl)
    val cols = VersionedTable.read(spark, cl).columns.toSet
    assert(cols === Set("id", "p", "extra"))
    assert(VersionedTable.read(spark, cl)
      .filter($"extra".isNotNull).count() === 1L)
  }
}
