package graft

import org.apache.spark.sql.functions._

import graft.core.VersionedTable
import graft.ops.Takedown

/** Cross-stack takedown: every surface forgets, re-running converges,
  * and the base delete is null-safe copy-on-write. */
class TakedownSpec extends SparkTestBase {
  import spark.implicits._

  test("commitDelete: key-set delete, null-safe, history intact") {
    val root = java.nio.file.Files
      .createTempDirectory("takedown").toString
    graft.core.Scratch.registerForCleanup(root)
    val t = s"$root/t"
    VersionedTable.commitAppend(Seq(
      (Option(1L), "a"), (Option(2L), "b"),
      (Option.empty[Long], "nullkey")).toDF("id", "p"), t)
    val v = VersionedTable.commitDelete(spark, t,
      Seq(Option(2L), Option.empty[Long]).toDF("id"), Seq("id"))
    assert(v === 2)
    val left = VersionedTable.read(spark, t).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1))).toSet
    assert(left === Set((Some(1L), "a")))
    // time travel still sees the pre-delete snapshot
    assert(VersionedTable.read(spark, t, Some(1)).count() === 3L)
    // deleting absent keys is a clean no-op version
    VersionedTable.commitDelete(spark, t, Seq(99L).toDF("id"), Seq("id"))
    assert(VersionedTable.read(spark, t).count() === 1L)
  }

  test("takedown propagates to base + both indexes; re-run converges") {
    val docs = Seq(
      (1L, "spark joins tables with hash join"),
      (2L, "join join join everywhere a join"),
      (3L, "window aggregation over streams"),
      (4L, "hash partitioned shuffle join strategy here"))
      .toDF("doc_id", "text")
    val vecs = (1L to 4L)
      .map(i => (i, (0 until 4).map(d => math.cos(i * 3.0 + d))))
      .toDF("doc_id", "vec")
    val root = graft.core.Scratch.root(docs) +
      s"/takedown_${java.util.UUID.randomUUID()}"
    graft.core.Scratch.registerForCleanup(root)
    val (base, bm, ivf) = (s"$root/base", s"$root/bm25", s"$root/ivf")
    VersionedTable.commitAppend(docs, base)
    graft.operators.Bm25Index.publish(docs, "doc_id", "text", bm)
    graft.operators.IvfIndex.publish(vecs, "doc_id", "vec", ivf,
      cells = 2)

    def run() = Takedown.forget(spark, Seq(2L).toDF("doc_id"),
      "doc_id", opId = 5L, basePath = Some(base), bm25Path = Some(bm),
      ivfPath = Some(ivf))
    run()
    assert(VersionedTable.read(spark, base)
      .filter($"doc_id" === 2L).count() === 0L)
    val qs = Seq((0L, "join hash")).toDF("query_id", "qtext")
    val sparse = graft.operators.Bm25Index.searchFrom(
      spark, bm, qs, "query_id", "qtext", "doc_id", k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(!sparse.contains(2L) && sparse.nonEmpty)
    val dense = graft.operators.IvfIndex.searchFrom(
      spark, ivf, vecs.filter($"doc_id" === 1L), "doc_id", "vec",
      "doc_id", k = 4, nprobe = 2)
      .collect().map(_.getLong(1)).toSet
    assert(!dense.contains(2L) && dense.nonEmpty)

    // retried takedown queue: same op again, then a different op with
    // the same ids — all converge without double-subtracting
    val statsBefore = VersionedTable.read(spark, s"$bm/stats")
      .collect().head.getAs[Long]("n_docs")
    run()
    Takedown.forget(spark, Seq(2L).toDF("doc_id"), "doc_id",
      opId = 6L, bm25Path = Some(bm), ivfPath = Some(ivf))
    assert(VersionedTable.read(spark, s"$bm/stats")
      .collect().head.getAs[Long]("n_docs") === statsBefore)

    // compliance audit: every surface reports zero reachable ids for
    // the taken-down set, and a non-deleted id shows up as a leak
    val clean = Takedown.audit(spark, Seq(2L).toDF("doc_id"),
        "doc_id", Some(base), Some(bm), Some(ivf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean === Map("base" -> 0L, "bm25" -> 0L, "ivf" -> 0L))
    val dirty = Takedown.audit(spark, Seq(2L, 3L).toDF("doc_id"),
        "doc_id", Some(base), Some(bm), Some(ivf))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dirty === Map("base" -> 1L, "bm25" -> 1L, "ivf" -> 1L))
  }

  test("erase + auditBytes: forgotten ids leave disk, history first intact") {
    val docs = Seq(
      (1L, "spark joins tables with hash join"),
      (2L, "join join join everywhere a join"),
      (3L, "window aggregation over streams"),
      (4L, "hash partitioned shuffle join strategy here"))
      .toDF("doc_id", "text")
    val vecs = (1L to 4L)
      .map(i => (i, (0 until 4).map(d => math.cos(i * 3.0 + d))))
      .toDF("doc_id", "vec")
    val root = graft.core.Scratch.root(docs) +
      s"/erase_${java.util.UUID.randomUUID()}"
    graft.core.Scratch.registerForCleanup(root)
    val (base, bm, ivf) = (s"$root/base", s"$root/bm25", s"$root/ivf")
    VersionedTable.commitAppend(docs, base)
    graft.operators.Bm25Index.publish(docs, "doc_id", "text", bm)
    graft.operators.IvfIndex.publish(vecs, "doc_id", "vec", ivf,
      cells = 2)
    val ids = Seq(2L).toDF("doc_id")
    Takedown.forget(spark, ids, "doc_id", opId = 5L,
      basePath = Some(base), bm25Path = Some(bm), ivfPath = Some(ivf))

    // after forget, REACHABILITY is clean but BYTES remain: the
    // merge-on-read index rows and the base's pre-delete version are
    // still physically on disk — exactly what auditBytes must see
    def bytes() = Takedown.auditBytes(spark, ids, "doc_id",
        Some(base), Some(bm), Some(ivf))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    val before = bytes()
    assert(before("bm25_postings")._2 > 0L, "postings bytes must remain")
    assert(before("base")._2 > 0L, "pre-delete base version on disk")
    // history still addressable before the erase vacuums it
    assert(VersionedTable.read(spark, base, Some(1)).count() === 4L)

    Takedown.erase(spark, opId = 6L, basePath = Some(base),
      bm25Path = Some(bm), ivfPath = Some(ivf), graceMs = 0L)
    val after = bytes()
    for ((s, (stray, hits, live)) <- after) {
      assert(stray === 0, s"$s stray files")
      assert(hits === 0L, s"$s raw hits")
      assert(live === 3L, s"$s live docs")
    }
    // searches unchanged by the purge
    val qs = Seq((0L, "join hash")).toDF("query_id", "qtext")
    val sparse = graft.operators.Bm25Index.searchFrom(
      spark, bm, qs, "query_id", "qtext", "doc_id", k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(!sparse.contains(2L) && sparse.nonEmpty)
    // erase is idempotent maintenance: a second run converges
    Takedown.erase(spark, opId = 7L, basePath = Some(base),
      bm25Path = Some(bm), ivfPath = Some(ivf), graceMs = 0L)
    assert(bytes() === after)
  }

  test("audit reports (not crashes on) a pre-deletes index layout") {
    // an index published before the tombstone feature has NO deletes
    // table (version 0) — the exact "registered after the takedown"
    // leak case the audit exists to catch, so it must report the
    // leak, not throw on the missing table. Simulate the old layout:
    // audit reads only doclen + deletes
    val doclen = Seq((1L, 2L), (2L, 2L)).toDF("doc_id", "dl")
    val root = graft.core.Scratch.root(doclen) +
      s"/takedown_${java.util.UUID.randomUUID()}"
    graft.core.Scratch.registerForCleanup(root)
    val bm = s"$root/bm25_predeletes"
    VersionedTable.commitAppend(doclen, s"$bm/doclen")
    val leaked = Takedown.audit(spark, Seq(2L).toDF("doc_id"),
        "doc_id", bm25Path = Some(bm))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(leaked === Map("bm25" -> 1L))
  }

  test("forget/erase with zero surfaces is refused, not a silent no-op") {
    import spark.implicits._
    val ids = Seq(1L).toDF("doc_id")
    val e1 = intercept[IllegalArgumentException] {
      Takedown.forget(spark, ids, "doc_id", opId = 1L)
    }
    assert(e1.getMessage.contains("at least one surface"))
    val e2 = intercept[IllegalArgumentException] {
      Takedown.erase(spark, opId = 1L)
    }
    assert(e2.getMessage.contains("at least one surface"))
  }
}
