package graft.core

import org.apache.spark.sql.DataFrame

/** Fault-tolerant eager materialization for intermediate pipeline
  * results.
  *
  * Why not `localCheckpoint(true)`: executor-local checkpoint blocks
  * have TRUNCATED lineage — if an executor holding blocks dies after the
  * checkpoint, the job fails instead of recomputing. Fine in local mode,
  * the wrong default for a 100 TB pipeline stage. Writing to the scratch
  * filesystem and reading back keeps the result durable (any executor
  * can re-read it) while still letting upstream caches be released.
  *
  * Lifecycle: every materialized path is registered for deletion at JVM
  * exit, and iterative callers ([[graft.operators.DedupClusters]]) drop
  * superseded rounds eagerly via [[drop]] — a long-lived session never
  * accumulates unbounded scratch.
  */
object Scratch {

  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // paths referenced by SESSION-LIVED artifacts (ModelCache values that
  // carry a scratch path): excluded from reclaimEphemeral, deleted only
  // at JVM exit
  private val pinned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.forEach(p => deleteQuietly(p))))
  }

  // > 0 while the current thread is building a session-cached artifact
  // (ModelCache.cached wraps training in pinningScope): any path
  // materialized then may be embedded in the cached value and must
  // outlive per-pass reclamation
  private val pinDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Run `body` with every scratch path it creates marked session-lived
    * (survives [[reclaimEphemeral]], still deleted at JVM exit).
    * [[ModelCache.cached]] wraps training in this so cached artifacts
    * that embed a scratch path (BPE vocab tables, IVF assignments,
    * clustermaps) stay readable for the whole session. */
  def pinningScope[T](body: => T): T = {
    pinDepth.set(pinDepth.get + 1)
    try body finally pinDepth.set(pinDepth.get - 1)
  }

  private def record(path: String): Unit = {
    created.add(path)
    if (pinDepth.get > 0) pinned.add(path)
    ()
  }

  /** Delete every scratch path NOT pinned by a session-cached artifact
    * — the between-passes reclamation a long benchmark/export run needs
    * ([[graft.Bench]] calls this after each pass): per-execution
    * VersionedTable roots and materialized intermediates otherwise
    * accumulate until JVM exit, and the growing disk/page-cache
    * footprint taxes every later query in the run. Only call at a
    * quiescent point — no in-flight query may hold DataFrames over
    * unpinned scratch. */
  def reclaimEphemeral(): Unit =
    created.forEach { p =>
      if (!pinned.contains(p)) { deleteQuietly(p); created.remove(p) }
    }

  private def deleteQuietly(path: String): Unit =
    try {
      // Hadoop FS, not java.io.File: the scratch root may be a shared
      // filesystem (spark.graft.scratch.dir=hdfs://… on a cluster),
      // where a java.io delete is a silent no-op and every
      // materialization would leak past JVM exit
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (fs.exists(p)) { fs.delete(p, true); () }
    } catch { case _: Throwable => () }

  /** Root for scratch tables: `spark.graft.scratch.dir` if set (point it
    * at a shared filesystem on a real cluster), else the JVM temp dir
    * (correct for local mode, where driver and executors share a host).
    */
  def root(df: DataFrame): String =
    df.sparkSession.conf.getOption("spark.graft.scratch.dir")
      .getOrElse(sys.props("java.io.tmpdir")
        .stripSuffix("/") + "/graft-scratch")

  /** Write `df` to a unique scratch path and return a fresh reader over
    * it plus the path (for eager [[drop]] once superseded). The caller
    * may then unpersist/release whatever produced `df`.
    */
  def materializeWithPath(df: DataFrame, tag: String)
      : (DataFrame, String) = {
    hookInstalled
    val path = s"${root(df)}/${tag}_${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(path)
    record(path)
    (df.sparkSession.read.parquet(path), path)
  }

  def materialize(df: DataFrame, tag: String): DataFrame =
    materializeWithPath(df, tag)._1

  /** Register an externally-created path (e.g. a scratch-rooted
    * VersionedTable) for the same delete-at-JVM-exit lifecycle as
    * materialized tables. */
  def registerForCleanup(path: String): Unit = {
    hookInstalled
    record(path)
  }

  /** Delete a scratch table that is no longer referenced. The caller
    * must not hold live DataFrames over it. */
  def drop(spark: org.apache.spark.sql.SparkSession, path: String)
      : Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try { fs.delete(p, true); () }
    catch { case _: java.io.IOException => () }
    created.remove(path)
    pinned.remove(path)
    ()
  }
}
