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
    // all-None would "succeed" while deleting nothing — in a
    // right-to-be-forgotten flow a silent no-op is a compliance
    // failure, so the write side refuses it (the audits already do)
    require(basePath.nonEmpty || bm25Path.nonEmpty || ivfPath.nonEmpty,
      "forget needs at least one surface (basePath/bm25Path/ivfPath)")
    // the two INDEX deletions are independent surfaces — overlap them
    // (guide §2.6); the base delete stays strictly LAST to preserve
    // the reader-visible ordering contract (indexes first, base last)
    graft.core.Par.run[Unit](
      bm25Path.map(p => () => {
        Bm25Index.forget(spark, p, ids, idCol, opId); ()
      }).toSeq ++
      ivfPath.map(p => () => {
        IvfIndex.forget(spark, p, ids, idCol); ()
      }).toSeq)
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

  /** Complete the PHYSICAL half of a takedown in one call: purge the
    * merge-on-read tombstones out of every index (copy-on-write
    * rewrite, [[Bm25Index.purgeForgotten]] / [[IvfIndex
    * .purgeForgotten]]) and then [[VersionedTable.vacuum]] every
    * participating table down to its latest version, so the
    * forgotten bytes leave disk — the privacy SLA's actual endpoint,
    * which [[audit]]'s reachability semantics deliberately do not
    * measure. [[auditBytes]] is the matching gate.
    *
    * `graceMs = 0` is only safe when no writer is concurrent (the
    * vacuum contract); pass the default grace when streams may be
    * mid-commit. This is SCHEDULED maintenance batching many forgets
    * (cost ∝ table, like compaction) — never the per-takedown path.
    *
    * HISTORY CONTRACT: erase vacuums every participating surface to
    * `retainLast = 1`, which destroys ALL pre-erase time travel on
    * those tables — including versions that never contained the
    * forgotten ids. That is deliberate: distinguishing id-bearing
    * versions would itself require scanning the history about to be
    * destroyed, and any retained version older than the forget COULD
    * reference a file carrying the ids (manifests share files across
    * versions), so the only byte-level-safe retention is "the live
    * version". Snapshot anything you need for debugging (cloneFrom)
    * BEFORE scheduled erasure runs. */
  def erase(spark: SparkSession, opId: Long,
      basePath: Option[String] = None,
      bm25Path: Option[String] = None,
      ivfPath: Option[String] = None,
      graceMs: Long = 15 * 60 * 1000L): Unit = {
    require(basePath.nonEmpty || bm25Path.nonEmpty || ivfPath.nonEmpty,
      "erase needs at least one surface (basePath/bm25Path/ivfPath)")
    // purges are per-index (distinct journals); vacuums are per-table
    // metadata+delete work — both phases overlap across surfaces
    // (guide §2.6). Purges complete before any vacuum starts, so a
    // vacuum never retires a version a purge still reads.
    graft.core.Par.run[Unit](
      bm25Path.map(p => () => {
        Bm25Index.purgeForgotten(spark, p, opId); ()
      }).toSeq ++
      ivfPath.map(p => () => {
        IvfIndex.purgeForgotten(spark, p, opId); ()
      }).toSeq)
    val tables =
      basePath.toSeq ++
      bm25Path.toSeq.flatMap(Bm25Index.componentPaths) ++
      ivfPath.toSeq.flatMap(IvfIndex.journalPaths)
    graft.core.Par.run[Unit](tables.map(t => () => {
      if (VersionedTable.latestVersion(spark, t) > 0)
        VersionedTable.vacuum(spark, t, retainLast = 1,
          graceMs = graceMs)
      ()
    }))
    ()
  }

  /** BYTE-LEVEL erasure audit — the physical counterpart of
    * [[audit]]: walk every parquet file PHYSICALLY ON DISK under each
    * id-bearing surface (referenced by a manifest or not — stray
    * unvacuumed history counts) and report, per surface:
    *
    *  - `n_stray_files`: files no retained manifest references (a
    *    completed [[erase]] leaves zero — non-zero means history
    *    still carries bytes);
    *  - `n_raw_hits`: rows matching the forgotten ids across ALL
    *    on-disk files (zero = the ids left disk);
    *  - `n_live_docs`: distinct ids surviving on disk (the
    *    replayable "expected surviving content" dimension an oracle
    *    can recompute).
    *
    * Surfaces scanned: the base table itself, BM25 `postings` +
    * `doclen`, IVF `assigned` — every table keyed by document id.
    * The `deletes` tombstone lists are NOT scanned: they hold the
    * processing record of the request (ids only, no content), which
    * compliance regimes retain; [[erase]] resets them to empty
    * anyway. Scan cost ∝ surface bytes — this is the audit you run
    * after scheduled purge maintenance, not per query. */
  def auditBytes(spark: SparkSession, ids: DataFrame, idCol: String,
      basePath: Option[String] = None,
      bm25Path: Option[String] = None,
      ivfPath: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val idsOnly = ids.select(col(idCol)).distinct()
      .withColumn("__hit", lit(1))

    def rawParquet(table: String): Seq[String] = {
      val root = new org.apache.hadoop.fs.Path(s"$table/data")
      val f = root.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (!f.exists(root)) return Seq.empty
      val it = f.listFiles(root, true)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet"))
          out += s.getPath.toString
      }
      out.toSeq
    }
    def referenced(table: String): Set[String] = {
      val latest = VersionedTable.latestVersion(spark, table)
      (1 to latest).flatMap { v =>
        try VersionedTable.files(spark, table, Some(v))
        catch { case _: Exception => Seq.empty } // vacuumed manifest
      }.toSet
    }
    def surfaceRow(surface: String, table: String): DataFrame = {
      val raw = rawParquet(table)
      // path-string normalization: manifests store fully-qualified
      // URIs; compare on scheme-stripped suffixes
      def norm(p: String): String = p.replaceFirst("^[a-z]+:(//)?", "")
      val refd = referenced(table).map(norm)
      val nStray = raw.count(p => !refd.contains(norm(p)))
      if (raw.isEmpty)
        return spark.range(1).select(lit(surface).as("surface"),
          lit(0).as("n_stray_files"),
          lit(0L).as("n_raw_hits"), lit(0L).as("n_live_docs"))
      val rd =
        if (VersionedTable.isEvolved(spark, table))
          spark.read.option("mergeSchema", "true")
        else spark.read
      rd.parquet(raw: _*).select(col(idCol))
        .join(broadcast(idsOnly), Seq(idCol), "left")
        .agg(count(col("__hit")).as("n_raw_hits"),
          count_distinct(col(idCol)).as("n_live_docs"))
        .select(lit(surface).as("surface"),
          lit(nStray).as("n_stray_files"),
          col("n_raw_hits"), col("n_live_docs"))
    }
    val parts =
      basePath.map(p => surfaceRow("base", p)).toSeq ++
      bm25Path.toSeq.flatMap(p => Seq(
        surfaceRow("bm25_postings", s"$p/postings"),
        surfaceRow("bm25_doclen", s"$p/doclen"))) ++
      ivfPath.map(p => surfaceRow("ivf_assigned", s"$p/assigned")).toSeq
    require(parts.nonEmpty, "auditBytes needs at least one surface")
    parts.reduce(_.unionByName(_))
  }
}
