package graft

import org.apache.spark.sql.functions._

import graft.core.VersionedTable

/** Append-schema contract: drifted appends fail LOUDLY (parquet would
  * otherwise resolve a mixed-schema file list nondeterministically
  * and corrupt later reads silently); additive evolution is explicit
  * via commitAppendEvolve and read-compatible both ways. */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def freshPath(): String = {
    val p = graft.core.Scratch.root(spark.range(1).toDF()) +
      s"/schevo_${java.util.UUID.randomUUID()}"
    graft.core.Scratch.registerForCleanup(p)
    p
  }

  test("matching appends pass; reordered columns and in-memory vs " +
    "parquet nullability are not drift") {
    val p = freshPath()
    VersionedTable.commitAppend(
      Seq((1L, "a", Seq(1.0, 2.0))).toDF("id", "s", "vec"), p)
    // reordered columns, same set
    VersionedTable.commitAppend(
      Seq((Seq(3.0), "b", 2L)).toDF("vec", "s", "id"), p)
    // fresh Seq.toDF arrays are containsNull=false; parquet read-back
    // is containsNull=true — must not read as a retype
    VersionedTable.commitAppend(
      VersionedTable.read(spark, p).limit(1), p)
    assert(VersionedTable.read(spark, p).count() == 3)
  }

  test("added, dropped, and retyped columns all fail loudly") {
    val p = freshPath()
    VersionedTable.commitAppend(
      Seq((1L, "a")).toDF("id", "s"), p)
    val added = intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(
        Seq((2L, "b", 0.5)).toDF("id", "s", "score"), p)
    }
    assert(added.getMessage.contains("commitAppendEvolve"))
    val dropped = intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(Seq(Tuple1(3L)).toDF("id"), p)
    }
    assert(dropped.getMessage.contains("drop"))
    val retyped = intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(
        Seq(("4", "d")).toDF("id", "s"), p)
    }
    assert(retyped.getMessage.contains("retype"))
    // nothing landed: the table still has exactly the original row
    assert(VersionedTable.read(spark, p).count() == 1)
  }

  test("commitAppendEvolve: additive columns merge on read, old rows " +
    "null out, pre-evolution versions keep their schema") {
    val p = freshPath()
    val v1 = VersionedTable.commitAppend(
      Seq((1L, "a")).toDF("id", "s"), p)
    VersionedTable.commitAppendEvolve(
      Seq((2L, "b", 0.5)).toDF("id", "s", "score"), p)
    val t = VersionedTable.read(spark, p)
    assert(t.columns.toSet == Set("id", "s", "score"))
    assert(t.filter($"id" === 1L).select("score").collect()
      .head.isNullAt(0))
    assert(t.filter($"id" === 2L).select("score").collect()
      .head.getDouble(0) == 0.5)
    // time travel: the pre-evolution version has no evolved footers
    assert(VersionedTable.read(spark, p, Some(v1))
      .columns.toSet == Set("id", "s"))
    // evolution is additive-only: dropping via evolve still rejects
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppendEvolve(Seq(Tuple1(9L)).toDF("id"), p)
    }
    // post-evolution matching appends keep working (score now part of
    // the schema — a batch WITH it passes commitAppend)
    VersionedTable.commitAppend(
      Seq((3L, "c", 1.5)).toDF("id", "s", "score"), p)
    assert(VersionedTable.read(spark, p).count() == 3)
  }

  test("timestamp-as-of reads resolve to the version current at the " +
    "time; restore republishes an old snapshot as a new version") {
    val p = freshPath()
    VersionedTable.commitAppend(Seq((1L, "a")).toDF("id", "s"), p)
    Thread.sleep(1100) // local-fs mtime granularity can be 1 s
    val tsBetween = System.currentTimeMillis()
    Thread.sleep(1100)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("id", "s"), p)

    assert(VersionedTable.versionAsOf(spark, p, tsBetween) == 1)
    assert(VersionedTable.readAsOf(spark, p, tsBetween).count() == 1)
    assert(VersionedTable.readAsOf(spark, p,
      System.currentTimeMillis()).count() == 2)
    // before any commit: no resolvable version
    intercept[IllegalArgumentException] {
      VersionedTable.readAsOf(spark, p, 1000L)
    }
    // restore v1: content rolls back, history is preserved
    val v3 = VersionedTable.restore(spark, p, 1)
    assert(v3 == 3)
    assert(VersionedTable.read(spark, p).as[(Long, String)]
      .collect().toSeq == Seq((1L, "a")))
    assert(VersionedTable.read(spark, p, Some(2)).count() == 2,
      "restore must not erase the history it rolls back")
  }

  test("compaction preserves the evolved column across mixed-schema " +
    "small files") {
    val p = freshPath()
    VersionedTable.commitAppend(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), p)
    VersionedTable.commitAppendEvolve(
      Seq((3L, "c", 0.5)).toDF("id", "s", "score"), p)
    // every file is tiny → all rewritten into one merged-schema file
    val v = VersionedTable.compact(spark, p, targetBytes = 1 << 20)
    val t = VersionedTable.read(spark, p, Some(v))
    assert(t.columns.toSet == Set("id", "s", "score"))
    assert(t.count() == 3)
    assert(t.filter($"id" === 3L).select("score").collect()
      .head.getDouble(0) == 0.5,
      "compaction dropped the evolved column's values")
    assert(t.filter($"id" === 1L).select("score").collect()
      .head.isNullAt(0))
  }
}
