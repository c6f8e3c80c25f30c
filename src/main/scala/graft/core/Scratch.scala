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
  // at JVM exit. REFCOUNTED, one count per holding scope: a cache-churny
  // session evicts entries at MaxEntries, and an evicted artifact's
  // scratch must become reclaimable again ([[releasePins]]) or the
  // pass-boundary sweep re-accumulates exactly the footprint it exists
  // to eliminate — while a path held by TWO live artifacts (a nested
  // cached train) must survive either one's eviction.
  private val pinned =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.forEach(p => deleteQuietly(p))))
  }

  // the stack of active pinning scopes on this thread (non-empty while
  // building a session-cached artifact — ModelCache.cached wraps
  // training in pinningScopeTracked): any path materialized then may be
  // embedded in the cached value and must outlive per-pass reclamation
  private val scopeStack =
    new ThreadLocal[List[scala.collection.mutable.Set[String]]] {
      override def initialValue()
          : List[scala.collection.mutable.Set[String]] = Nil
    }

  /** Run `body` with every scratch path it creates marked session-lived
    * (survives [[reclaimEphemeral]], still deleted at JVM exit).
    * [[ModelCache.cached]] wraps training in the tracked variant so
    * cached artifacts that embed a scratch path (BPE vocab tables, IVF
    * assignments, clustermaps) stay readable for the whole session.
    * This untracked form is a PERMANENT pin (never released) — for
    * paths held by session-lifetime maps that never evict. */
  def pinningScope[T](body: => T): T = pinningScopeTracked(body)._1

  /** [[pinningScope]] that also returns the set of scratch paths the
    * body created, so the caller can [[releasePins]] them when the
    * artifact holding them is dropped (ModelCache eviction). Nested
    * scopes each hold their own count on inner paths: releasing the
    * inner artifact's pins never strands an outer artifact that still
    * embeds the same path. */
  def pinningScopeTracked[T](body: => T): (T, Set[String]) = {
    val mine = scala.collection.mutable.Set.empty[String]
    scopeStack.set(mine :: scopeStack.get)
    try { val v = body; (v, mine.toSet) }
    finally scopeStack.set(scopeStack.get.tail)
  }

  /** Drop one pin count per path (an artifact holding them was evicted
    * or superseded). A path whose count reaches zero becomes ordinary
    * ephemeral scratch again — deleted by the next [[reclaimEphemeral]]
    * (not immediately: a concurrent reader may still be draining it,
    * and the sweep's quiescent-point contract is the safe boundary). */
  def releasePins(paths: Iterable[String]): Unit =
    paths.foreach { p =>
      pinned.computeIfPresent(p,
        (_, n) => if (n <= 1) null else Integer.valueOf(n - 1))
      ()
    }

  private def record(path: String): Unit = {
    created.add(path)
    // one pin count per ACTIVE scope: each enclosing artifact holds
    // its own claim on the path (released independently on eviction).
    // Synchronized per set: [[Par]] workers share the spawning
    // thread's scopes, so two parallel tasks may record concurrently
    scopeStack.get.foreach { s =>
      if (s.synchronized(s.add(path)))
        pinned.merge(path, 1, (a, b) => a + b)
      ()
    }
    ()
  }

  /** The calling thread's active pinning scopes — captured by
    * [[Par.run]] so worker threads inherit them. */
  private[core] def currentScopes
      : List[scala.collection.mutable.Set[String]] = scopeStack.get

  /** Run `body` with the given scopes installed on THIS thread (a
    * [[Par]] worker standing in for the spawning thread). */
  private[core] def withScopes[T](
      scopes: List[scala.collection.mutable.Set[String]])(body: => T)
      : T = {
    val prev = scopeStack.get
    scopeStack.set(scopes)
    try body finally scopeStack.set(prev)
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
      if (!pinned.containsKey(p)) { deleteQuietly(p); created.remove(p) }
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
    val sc = df.sparkSession.sparkContext
    val prevDesc = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"scratch $tag")
    try df.write.mode("overwrite").parquet(path)
    finally sc.setJobDescription(prevDesc)
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
    * must not hold live DataFrames over it. Clears every pin count —
    * drop is the "I know it's dead" verb (iterative supersession). */
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
