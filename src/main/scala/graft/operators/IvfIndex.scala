package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.VersionedTable

/** Persisted, incrementally-maintained IVF ANN index — the dense twin
  * of [[Bm25Index]], and the artifact shape a 100 TB similarity stack
  * actually operates: train the coarse quantizer ONCE, persist
  * codebook + cell assignments, then admit new embedding batches by
  * assigning them against the FROZEN codebook (a narrow map + append)
  * — never re-clustering the corpus per batch. Searches probe the
  * persisted assignment table.
  *
  * Artifact layout (both [[graft.core.VersionedTable]]s):
  * {{{
  *   path/codebook  (cell INT, centroid ARRAY<DOUBLE>)   tiny
  *   path/assigned  (cell, id, vec ARRAY<DOUBLE>)        corpus-sized
  * }}}
  *
  * The frozen-codebook contract is the standard IVF discipline (FAISS
  * `add` after `train`): cell boundaries stay fixed between retrains,
  * so admission is append-only and search results over published +
  * admitted batches are IDENTICAL to an index built on the full
  * corpus with the same codebook — which is what the q143 oracle
  * (full-corpus replay from the old-slice codebook) checks. Retraining
  * on drift = a new [[publish]] (new versions; readers pin).
  */
object IvfIndex {

  private def codebookPath(path: String) = s"$path/codebook"
  private def assignedPath(path: String) = s"$path/assigned"

  /** Train (optional) + assign + persist. Returns assigned version. */
  def publish(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, cells: Int = 16, trainIters: Int = 0): Int = {
    val spark = corpus.sparkSession
    val codebook =
      if (trainIters > 0)
        SimilarityOps.kmeansTrain(corpus, idCol, vecCol, cells, trainIters)
      else SimilarityOps.initCodebook(corpus, idCol, vecCol, cells)
    import spark.implicits._
    val cbDf = codebook.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "centroid")
    VersionedTable.commitOverwrite(cbDf, codebookPath(path))
    VersionedTable.commitOverwrite(
      assign(corpus, idCol, vecCol, codebook), assignedPath(path))
  }

  /** Admit a batch of NEW vectors against the frozen codebook: one
    * narrow assignment map + one append. Returns assigned version. */
  def update(batch: DataFrame, idCol: String, vecCol: String,
      path: String): Int = {
    val codebook = readCodebook(batch.sparkSession, path)
    VersionedTable.commitAppend(
      assign(batch, idCol, vecCol, codebook), assignedPath(path))
  }

  /** Maintenance: bin-pack the assignment table's accumulated small
    * commit files (every admitted batch appends one); the codebook is
    * a single tiny file and never needs it. Same semantics as
    * [[Bm25Index.compactIndex]]: a new version, race-safe, time travel
    * intact. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, targetBytes: Long = 128L * 1024 * 1024): Unit = {
    VersionedTable.compact(spark, assignedPath(path), targetBytes)
    ()
  }

  private def assign(df: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Double]]): DataFrame =
    SimilarityOps.assignCells(
      df.select(col(idCol),
        col(vecCol).cast("array<double>").as("__cv")), "__cv", codebook)
      .select(col("cell"), col(idCol), col("__cv").as("vec"))

  /** Streaming admission: a `foreachBatch` sink assigning every
    * micro-batch of new vectors against the frozen codebook and
    * appending — the continuous-ingestion shape of ANN index
    * maintenance. First batch [[publish]]es (training the codebook on
    * it); later batches [[update]]. Exactly-once per batch via
    * [[graft.core.TxnJournal]]: although an update is a single append,
    * a crash between the append and a bare marker would double-admit
    * the batch on replay, so the journal's rollback covers it too. */
  def foreachBatchIngest(path: String, idCol: String, vecCol: String,
      cells: Int = 16, trainIters: Int = 0, compactEvery: Int = 0)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new org.apache.hadoop.fs.Path(s"$path/_txn/b$batchId.done")
    if (!f.exists(done)) {
      val vecs = batch.select(col(idCol), col(vecCol))
      val pubMarker = new org.apache.hadoop.fs.Path(
        s"$path/_txn/b$batchId.publish")
      val isFirst = f.exists(pubMarker) ||
        VersionedTable.latestVersion(spark, assignedPath(path)) == 0
      if (isFirst) {
        f.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_txn"))
        try f.create(pubMarker, false).close()
        catch { case _: java.io.IOException => () }
        publish(vecs, idCol, vecCol, path, cells, trainIters)
        f.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_txn"))
        try f.create(done, false).close()
        catch { case _: java.io.IOException => () } // lost claim: done
      } else {
        graft.core.TxnJournal.exactlyOnce(spark, path, batchId,
          Seq(assignedPath(path))) {
          update(vecs, idCol, vecCol, path)
        }
        ()
      }
      // layout maintenance outside the journal (see Bm25Index note)
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        compactIndex(spark, path)
    }
  }

  /** Streaming SERVING tap — the dense twin of
    * [[Bm25Index.foreachBatchServe]]: each query micro-batch probes
    * the index's current snapshot, ranked results (+`_batch_id`)
    * append to a versioned log under the same marker idempotence
    * (replays skip the search). */
  def foreachBatchServe(indexPath: String, logPath: String,
      queryIdCol: String, vecCol: String, idCol: String, k: Int,
      nprobe: Int = 4): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val inner = VersionedTable.foreachBatchAppend(logPath)
      val spark = batch.sparkSession
      val marker = new org.apache.hadoop.fs.Path(
        s"$logPath/_commits/b$batchId")
      val f = marker.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (!f.exists(marker)) {
        inner(searchFrom(spark, indexPath, batch, queryIdCol, vecCol,
          idCol, k, nprobe, excludeSelf = false), batchId)
      }
  }

  /** The persisted codebook, bounded cells×dim driver metadata. */
  def readCodebook(spark: SparkSession, path: String)
      : Array[Array[Double]] =
    VersionedTable.read(spark, codebookPath(path))
      .orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** IVF top-k straight off the persisted index: queries probe their
    * `nprobe` nearest cells of the STORED codebook; exact cosine only
    * inside probed cells of the STORED assignment table. Same
    * ranking/tie-break semantics as [[SimilarityOps.ivfTopK]]. */
  def searchFrom(spark: SparkSession, path: String, queries: DataFrame,
      queryIdCol: String, vecCol: String, idCol: String, k: Int,
      nprobe: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    val codebook = readCodebook(spark, path)
    val assigned = VersionedTable.read(spark, assignedPath(path))
      .select(col("cell"), col(idCol).as("neighbor_id"), col("vec"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val probes = q.withColumn("cell",
        explode(graft.functions.NearestCells.column(col("__qv"),
          codebook, nprobe)))
      .select(col("cell"), col("query_id"), col("__qv"))
    val joined = assigned.join(probes, Seq("cell"))
    // excludeSelf = corpus-internal queries (the q143 shape); external
    // queries (the serving tap) must NOT drop coincidental id matches
    val scored =
      (if (excludeSelf) joined.filter(col("neighbor_id") =!= col("query_id"))
       else joined)
        .withColumn("cos_sim",
          SimilarityOps.cosine(col("__qv"), col("vec")))
    SimilarityOps.rankTopK(scored, k)
  }
}
