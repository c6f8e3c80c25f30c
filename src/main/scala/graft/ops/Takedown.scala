package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.VersionedTable
import graft.operators.{Bm25Index, IvfIndex}

/** Takedown propagation across the retrieval stack — the operational
  * loop behind a right-to-be-forgotten request: removing a document
  * from the BASE table is not enough once derived artifacts serve it
  * (sparse postings, dense assignments). One call propagates the ids
  * to every registered surface, each by that surface's own deletion
  * shape:
  *
  *  - base corpus table: copy-on-write [[VersionedTable.commitDelete]]
  *    (a corpus table is rewritten rarely; history stays addressable
  *    until vacuum — the privacy SLA's final step);
  *  - BM25 index: merge-on-read tombstones + exact df/stats
  *    subtraction ([[Bm25Index.forget]], journal-fenced per `opId`);
  *  - IVF index: pure tombstoning ([[IvfIndex.forget]], atomic
  *    single-table append; purged at the next drift retrain).
  *
  * Ordering: indexes FIRST, base LAST — a reader racing the takedown
  * may transiently see a doc in the base that searches no longer
  * return (benign), never a search hit whose base row is already
  * gone. Cross-surface atomicity is deliberately NOT promised: each
  * surface is individually crash-safe/idempotent, and re-running the
  * same takedown (same `opId`) converges — the operational contract
  * of takedown pipelines, which are retried queues, not transactions.
  */
object Takedown {

  /** Propagate `ids` (column `idCol`) across the stack. Any of the
    * three paths may be None (surface not deployed). Returns
    * `Some(newBaseVersion)` when a base path was given, `None`
    * otherwise — callers branching on the base outcome never confuse
    * "no base surface" with a version number. Re-running with the same
    * `opId` is safe on every surface. */
  def forget(spark: SparkSession, ids: DataFrame, idCol: String,
      opId: Long, basePath: Option[String] = None,
      bm25Path: Option[String] = None,
      ivfPath: Option[String] = None): Option[Int] = {
    bm25Path.foreach(p =>
      Bm25Index.forget(spark, p, ids, idCol, opId))
    ivfPath.foreach(p => IvfIndex.forget(spark, p, ids, idCol))
    basePath.map(p =>
      VersionedTable.commitDelete(spark, p, ids, Seq(idCol)))
  }

  /** Compliance audit for a completed takedown: per surface, how many
    * of `ids` are still REACHABLE — base rows still present, BM25
    * doclen entries not tombstoned, IVF assignments not tombstoned.
    * All-zero `n_leaked` is the release gate a privacy review signs
    * off on; a non-zero row names the surface that missed the memo
    * (e.g. an index registered after the takedown ran).
    *
    * Shape at scale: per surface one semi-join of the (takedown-sized,
    * broadcast) id set against the surface's key column — never a full
    * cross-surface reconciliation. Tombstoned-but-unpurged rows count
    * as NOT reachable: the audit measures what a reader can see, not
    * physical bytes ([[graft.core.VersionedTable.vacuum]] and retrain
    * purges are the byte-level follow-up). */
  def audit(spark: SparkSession, ids: DataFrame, idCol: String,
      basePath: Option[String] = None,
      bm25Path: Option[String] = None,
      ivfPath: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val idsOnly = ids.select(col(idCol)).distinct()
    def leaked(surface: String, visible: DataFrame): DataFrame =
      visible.select(col(idCol))
        .join(broadcast(idsOnly), Seq(idCol), "left_semi")
        .agg(count(lit(1)).as("n_leaked"))
        .select(lit(surface).as("surface"), col("n_leaked"))
    // an index published before the tombstone feature (or never
    // forgotten from) has `deletes` at version 0 — exactly the
    // "registered after the takedown" leak case the audit must REPORT,
    // not crash on. Missing deletes table == tombstone-free.
    def minusTombstones(visible: DataFrame, deletesPath: String) =
      if (VersionedTable.latestVersion(spark, deletesPath) == 0) visible
      else visible.join(
        broadcast(VersionedTable.read(spark, deletesPath)),
        Seq(idCol), "left_anti")
    val parts =
      basePath.map(p => leaked("base",
        VersionedTable.read(spark, p))).toSeq ++
      bm25Path.map(p => leaked("bm25", minusTombstones(
        VersionedTable.read(spark, s"$p/doclen"),
        s"$p/deletes"))).toSeq ++
      ivfPath.map(p => leaked("ivf", minusTombstones(
        VersionedTable.read(spark, s"$p/assigned"),
        s"$p/deletes"))).toSeq
    require(parts.nonEmpty, "audit needs at least one surface")
    parts.reduce(_.unionByName(_))
  }
}
