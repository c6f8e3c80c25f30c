package graft

import java.nio.file.Files

import graft.core.ModelCache

/** The train-once model-artifact cache: hit on identical (plan,
  * params), miss on changed params, and — the silent-wrong-answer
  * guard — miss after the underlying FILES change, even though the
  * re-read plan canonicalizes identically (path + schema unchanged).
  */
class ModelCacheSpec extends SparkTestBase {
  import spark.implicits._

  test("identical plan+params trains once; changed params retrain") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    var trains = 0
    def go(key: String) =
      ModelCache.cached(df, key) { trains += 1; s"model-$key-$trains" }
    assert(go("k1") == "model-k1-1")
    assert(go("k1") == "model-k1-1") // cache hit, no retrain
    assert(trains == 1)
    assert(go("k2") == "model-k2-2") // different params: new artifact
    assert(trains == 2)
  }

  test("file-backed table overwritten mid-session retrains (no clear)") {
    val path = Files.createTempDirectory("mc").toString + "/t"
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x")
      .write.mode("overwrite").parquet(path)
    var trains = 0
    def train() = ModelCache.cached(
      spark.read.parquet(path), "model") { trains += 1; trains }
    assert(train() == 1)
    assert(train() == 1) // same snapshot: cache hit
    // the overwrite changes the file snapshot; the re-read plan
    // canonicalizes the same (same path, same schema), so a plan-only
    // key would serve the STALE model here
    Seq((9L, 9.0)).toDF("id", "x").write.mode("overwrite").parquet(path)
    assert(train() == 2)
    assert(train() == 2)
  }

  test("concurrent same-key callers train exactly once") {
    val df = Seq((1L, "z")).toDF("id", "v")
    val trains = new java.util.concurrent.atomic.AtomicInteger(0)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val vals = Await.result(Future.sequence((0 until 8).map(_ => Future {
      ModelCache.cached(df, "race") {
        Thread.sleep(50) // widen the window a lockless impl would lose
        trains.incrementAndGet()
      }
    })), 1.minute)
    assert(trains.get() == 1, "same artifact trained more than once")
    assert(vals.toSet == Set(1))
  }

  test("eviction is LRU: a recent hit survives a cold-key flood") {
    ModelCache.clear()
    val hot = Seq((1L, "hot")).toDF("id", "v")
    var hotTrains = 0
    def getHot() = ModelCache.cached(hot, "hot") { hotTrains += 1 }
    getHot()
    // 70 cold entries overflow the 64-slot cache (7 evictions);
    // touching hot mid-flood must keep it resident — under FIFO the
    // touch is a no-op and hot (the oldest insert) is evicted first
    (0 until 70).foreach { i =>
      ModelCache.cached(hot, s"cold-$i") { () }
      if (i == 35) getHot() // refresh recency mid-flood
    }
    getHot()
    assert(hotTrains == 1, "LRU evicted a recently-touched artifact")
    ModelCache.clear()
  }

  test("eviction releases the evicted artifact's scratch pins; " +
    "survivors stay pinned") {
    ModelCache.clear()
    val oldMax = ModelCache.MaxEntries
    ModelCache.MaxEntries = 2
    try {
      def exists(p: String): Boolean =
        java.nio.file.Files.exists(java.nio.file.Paths.get(p))
      val df = Seq((1L, "p")).toDF("id", "v")
      def trainPath(key: String): String =
        ModelCache.cached(df, key) {
          graft.core.Scratch.materializeWithPath(df, s"mc_$key")._2
        }
      val p1 = trainPath("evict-1")
      val p2 = trainPath("evict-2")
      val p3 = trainPath("evict-3") // overflows the 2-slot cache: e1 out
      graft.core.Scratch.reclaimEphemeral()
      assert(!exists(p1),
        "an evicted artifact's scratch must become reclaimable — " +
          "pinned-forever re-accumulates exactly the footprint the " +
          "pass-boundary sweep exists to eliminate")
      assert(exists(p2) && exists(p3), "live artifacts must stay pinned")
      assert(spark.read.parquet(p3).count() == 1)
    } finally {
      ModelCache.MaxEntries = oldMax
      ModelCache.clear()
    }
  }

  test("distinct sessions do not share artifacts") {
    // a new session must never inherit another session's state (e.g.
    // scratch paths under a stopped session's cleaned-up temp dir)
    val df1 = Seq((1L, "s")).toDF("id", "v")
    val other = spark.newSession()
    val df2 = { import other.implicits._; Seq((1L, "s")).toDF("id", "v") }
    var trains = 0
    assert(ModelCache.cached(df1, "sess") { trains += 1; trains } == 1)
    assert(ModelCache.cached(df2, "sess") { trains += 1; trains } == 2)
  }
}
