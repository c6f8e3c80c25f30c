package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.VersionedTable

/** Cross-index hybrid retrieval serving — the tap a real RAG service
  * runs: each query micro-batch searches BOTH the BM25 index and the
  * IVF index, fuses with RRF ([[HybridSearch.rrf]] — the q159
  * scale-path shape), and appends the fused top-k to a versioned
  * results log exactly once per batch.
  *
  * The new correctness surface vs the per-system taps
  * ([[Bm25Index.foreachBatchServe]] / [[IvfIndex.foreachBatchServe]])
  * is CROSS-INDEX SNAPSHOT CONSISTENCY: each batch pins ONE committed
  * snapshot of each index before searching, so an ingest landing on
  * either index mid-batch — including a multi-table update caught
  * between its component commits — never bleeds into the fused
  * results. The pin reads every component table's latest version,
  * then clamps to the pinned pre-batch versions of any OPEN
  * [[graft.core.TxnJournal]] intent (intent present, done-marker
  * absent): an in-flight update's partially-landed commits are
  * thereby invisible, and what serves is exactly the last CONSISTENT
  * committed state.
  *
  * Scale shape per batch: two index searches (each corpus-parallel
  * with their own scale shapes — postings broadcast for BM25,
  * nprobe/cells probing for IVF), then fusion over queries×k rows
  * only. The log append is one small commit.
  */
object HybridServe {

  /** Last consistent committed versions of a journal-maintained
    * multi-table index: latest versions of `subs`, clamped to any open
    * intent under `root/_txn`. Named intents (`name:version` entries —
    * the current [[graft.core.TxnJournal]] format) clamp each sub BY
    * NAME, so an intent from a sink generation with more or fewer
    * sub-tables still pins the ones it shares with the reader. Legacy
    * bare-version intents carry no names and clamp element-wise only
    * when the arity matches (a different arity belongs to a different
    * sink generation and is ignored — safe, because such sinks commit
    * single tables atomically). */
  def pinConsistent(spark: SparkSession, root: String,
      subs: Seq[String]): Seq[Int] = {
    val latest = subs.map(VersionedTable.latestVersion(spark, _))
    val segs = subs.map(s => s.stripSuffix("/").split('/').last)
    val txn = new org.apache.hadoop.fs.Path(s"$root/_txn")
    val f = txn.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(txn)) return latest
    val open = f.listStatus(txn).map(_.getPath.getName)
      .filter(_.matches("[a-z]\\d+")) // b<batch> sinks + f<op> forgets
      .filterNot(n => f.exists(
        new org.apache.hadoop.fs.Path(txn, s"$n.done")))
    open.foldLeft(latest) { (acc, name) =>
      val in = f.open(new org.apache.hadoop.fs.Path(txn, name))
      val line =
        try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      if (line.contains(":")) {
        val byName = line.split(" ").flatMap { e =>
          val i = e.lastIndexOf(':')
          // an entry without ':' in a named-format line is corrupt —
          // skip it here (serving must stay available; TxnJournal
          // replay is where corruption fails loudly)
          if (i < 0) None
          else e.substring(i + 1).toIntOption.map(v =>
            e.substring(0, i) -> v)
        }.toMap
        acc.zip(segs).map { case (l, s) =>
          byName.get(s).fold(l)(math.min(l, _))
        }
      } else {
        val pinned = line.split(" ").flatMap(_.toIntOption).toSeq
        if (pinned.size == acc.size) acc.zip(pinned).map {
          case (l, p) => math.min(l, p)
        } else acc
      }
    }
  }

  /** The serving tap: fused (BM25 ⊕ IVF, RRF) top-`k` per query
    * appended to `logPath` with `_batch_id`, exactly once per batch.
    * Queries need (`qIdCol`, `qTextCol`, `qVecCol`). `inK` is each
    * system's retrieval depth feeding the fusion. */
  def foreachBatchServe(bm25Path: String, ivfPath: String,
      logPath: String, qIdCol: String, qTextCol: String,
      qVecCol: String, idCol: String, k: Int, inK: Int = 20,
      nprobe: Int = 4): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val marker = new org.apache.hadoop.fs.Path(
        s"$logPath/_commits/b$batchId")
      val f = marker.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (!f.exists(marker)) {
        val bmPin = pinConsistent(spark, bm25Path,
          Bm25Index.componentPaths(bm25Path))
        val ivfPin = pinConsistent(spark, ivfPath,
          IvfIndex.journalPaths(ivfPath))
        val sparse = Bm25Index.searchFromPinned(spark, bm25Path,
          bmPin.map(Some(_)), batch, qIdCol, qTextCol, idCol, inK)
        // external queries: an id collision with a corpus doc is
        // coincidence, not self-match — keep it
        val dense = IvfIndex.searchFromPinned(spark, ivfPath,
          Some(ivfPin(0)), Some(ivfPin(1)), batch, qIdCol, qVecCol,
          idCol, inK, nprobe, excludeSelf = false,
          deletesV = Some(ivfPin(4)))
        VersionedTable.foreachBatchAppend(logPath)(
          HybridSearch.rrf(sparse, idCol, dense, "neighbor_id", k),
          batchId)
      }
  }
}
