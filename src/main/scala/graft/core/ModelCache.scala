package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Session-scoped cache for DRIVER-HELD model artifacts (k-means /
  * PQ codebooks, BPE merge tables) trained deterministically from a
  * DataFrame: one benchmark/export session often trains the identical
  * model for several queries (encode, search, audit), and production
  * pipelines train once and reuse.
  *
  * Keyed on (session UUID, canonicalized analyzed PLAN, file snapshot,
  * parameter string):
  *  - the plan OBJECT, not its string form — LocalRelation's string
  *    omits the data, so two in-memory test corpora with the same
  *    schema would collide on strings;
  *  - the SESSION UUID so a new SparkSession never inherits artifacts
  *    holding another session's state (e.g. a BPE vocab scratch path
  *    under a stopped session's cleaned-up scratch dir);
  *  - for file-backed plans, a SNAPSHOT FINGERPRINT (path + size +
  *    mtime of every input file, from the plan's FileIndex) — a table
  *    overwritten mid-session changes its snapshot, so the next
  *    consumer retrains instead of serving a stale model (the
  *    silent-wrong-answer shape a plan-only key allowed).
  *
  * Cached values must be bounded model metadata (KBs), never
  * data-sized. Deliberately NOT for derived DataFrames / intermediate
  * results — caching those would skip the distributed work a per-query
  * isolation contract is supposed to measure; only the trained
  * artifact (which a real deployment persists and reuses) is memoized.
  *
  * Concurrency: training runs OUTSIDE the global map lock — a
  * k-means/BPE train is minutes of Spark jobs, and holding a global
  * monitor across it would serialize every concurrent trainer in the
  * JVM. Each key gets a per-key latch object instead: two threads
  * asking for the SAME artifact still train once (the second blocks on
  * the first's latch), while trainers of different artifacts proceed
  * in parallel.
  */
object ModelCache {

  /** Entry cap: the VALUES are bounded model metadata, but the plan
    * KEYS are not — a LocalRelation's canonicalized plan embeds its
    * row data, so an unbounded cache in a long-lived session (test
    * JVMs train over many in-memory corpora) would pin every such
    * corpus in driver memory. LRU eviction (a hit refreshes recency);
    * an evicted model simply retrains on next use. Mutable ONLY for
    * specs that exercise eviction without 64 training runs. */
  private[graft] var MaxEntries = 64

  private type Key = (String, LogicalPlan, String, String)

  // value + the scratch paths its training pinned: eviction must
  // release those pins ([[Scratch.releasePins]]) or a cache-churny
  // session re-accumulates until JVM exit exactly the disk/page-cache
  // footprint the pass-boundary sweep exists to eliminate
  private val cache =
    scala.collection.mutable.LinkedHashMap[Key, (Any, Set[String])]()
  private val inflight =
    new java.util.concurrent.ConcurrentHashMap[Key, Object]()

  /** Session identity for the cache key (via the bridge —
    * `sessionUUID` is `private[sql]`). */
  private def sessionId(df: DataFrame): String =
    org.apache.spark.sql.GraftBridge.sessionUUID(df.sparkSession)

  /** MD5 over (path, length, mtime) of every file a file-backed scan
    * in the plan reads — empty for fully in-memory plans. The listing
    * comes from the plan's own (already materialized) FileIndex, so
    * this is driver-memory work, not a filesystem walk. */
  private def fileSnapshot(df: DataFrame): String = {
    val entries = df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fsr: HadoopFsRelation =>
          fsr.location.listFiles(Nil, Nil).flatMap(_.files).map(f =>
            s"${f.getPath}#${f.getLen}#${f.getModificationTime}")
        case _ => Nil
      }
    }.flatten.sorted
    if (entries.isEmpty) ""
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(entries.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
  }

  /** Lookup that refreshes recency (true LRU, not FIFO): a hit
    * re-inserts the entry at the tail so hot artifacts survive a
    * session training many one-off models. */
  private def touch(k: Key): Option[Any] = cache.synchronized {
    cache.remove(k).map { v => cache.put(k, v); v._1 }
  }

  /** Memoized train — see the object doc for keying. LIFETIME
    * CONTRACT for values that embed a scratch path (BPE vocab tables,
    * IVF assignments, clustermaps): the path is pinned only while the
    * cache holds the entry. Eviction (MaxEntries LRU churn) releases
    * the pin, after which the next [[Scratch.reclaimEphemeral]]
    * deletes the files — so a caller must treat the returned value as
    * valid for the CURRENT unit of work only and re-fetch via
    * `cached()` (a hit refreshes recency; a miss retrains) across
    * reclaim boundaries, never stash it across passes/batches. The
    * alternative — pinning while any returned reference is live — is
    * unknowable from here (the JVM can't see caller liveness), and a
    * permanent pin is exactly the footprint leak refcounting exists
    * to stop. */
  def cached[T](df: DataFrame, key: String)(train: => T): T = {
    val k: Key = (sessionId(df),
      df.queryExecution.analyzed.canonicalized, fileSnapshot(df), key)
    // fast path: already trained
    touch(k) match {
      case Some(v) => return v.asInstanceOf[T]
      case None =>
    }
    // per-key latch: same-key trainers serialize, others run free
    val latch = inflight.computeIfAbsent(k, _ => new Object)
    latch.synchronized {
      touch(k) match {
        case Some(v) => v.asInstanceOf[T]
        case None =>
          // Spark jobs run here, no global lock held. pinningScope
          // (tracked): several cached artifacts ARE scratch paths (BPE
          // vocab, clustermap, hashed-vector tables) — anything
          // materialized while training must survive
          // Scratch.reclaimEphemeral for as long as this cache can
          // serve the value, and no longer (eviction releases)
          val (v, paths) = Scratch.pinningScopeTracked(train)
          cache.synchronized {
            if (cache.size >= MaxEntries) {
              val (_, (_, evictedPaths)) = cache.head
              cache.remove(cache.head._1)
              Scratch.releasePins(evictedPaths)
            }
            cache.put(k, (v, paths))
          }
          inflight.remove(k)
          v
      }
    }
  }

  def clear(): Unit = cache.synchronized {
    cache.valuesIterator.foreach(v => Scratch.releasePins(v._2))
    cache.clear()
  }
}
