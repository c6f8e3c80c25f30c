package graft

import graft.core.{ModelCache, Scratch}

/** Scratch lifecycle: per-pass reclamation must drop per-execution
  * ephemera while session-cached artifacts (whose values embed scratch
  * paths) stay readable — the contract [[graft.Bench]]'s pass-boundary
  * reclaim depends on. */
class ScratchSpec extends SparkTestBase {
  import spark.implicits._

  private def exists(p: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

  test("reclaimEphemeral drops unpinned scratch, keeps pinned") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "s")
    val (_, ephemeral) = Scratch.materializeWithPath(df, "scr_eph")
    val (_, pinnedPath) = Scratch.pinningScope {
      Scratch.materializeWithPath(df, "scr_pin")
    }
    val registered = java.nio.file.Files
      .createTempDirectory("scr_reg").toString
    Scratch.registerForCleanup(registered)
    assert(exists(ephemeral) && exists(pinnedPath) && exists(registered))
    Scratch.reclaimEphemeral()
    assert(!exists(ephemeral),
      "per-execution materialization must be reclaimed")
    assert(!exists(registered),
      "registered per-execution roots must be reclaimed")
    assert(exists(pinnedPath), "pinned artifact must survive")
    // the pinned table is still fully readable (not just a dir stub)
    assert(spark.read.parquet(pinnedPath).count() == 2)
    // drop releases a pinned path too (used by iterative supersession)
    Scratch.drop(spark, pinnedPath)
    assert(!exists(pinnedPath))
  }

  test("a path pinned by nested scopes survives releasing one of them") {
    val df = Seq((1, "n")).toDF("k", "s")
    // the nested-cached-train shape: an outer artifact embeds a path
    // an inner artifact also owns — either eviction alone must not
    // strand the other
    val ((path, innerPaths), outerPaths) = Scratch.pinningScopeTracked {
      Scratch.pinningScopeTracked {
        Scratch.materializeWithPath(df, "scr_nest")._2
      }
    }
    assert(innerPaths == Set(path) && outerPaths == Set(path))
    Scratch.releasePins(innerPaths)
    Scratch.reclaimEphemeral()
    assert(exists(path), "the outer scope still holds a pin")
    Scratch.releasePins(outerPaths)
    Scratch.reclaimEphemeral()
    assert(!exists(path), "last release makes the path ephemeral again")
  }

  test("artifacts trained under ModelCache survive reclamation") {
    val docs = Seq("alpha", "beta", "gamma").toDF("text")
    // the cached VALUE is a scratch path — the exact shape BPE vocab /
    // clustermap / hashed-vector training produces
    val path = ModelCache.cached(docs, "scratch-artifact-v1") {
      Scratch.materializeWithPath(docs, "scr_model")._2
    }
    Scratch.reclaimEphemeral()
    assert(exists(path),
      "a cache-embedded scratch path reclaimed mid-session would " +
        "break every later cache hit")
    assert(spark.read.parquet(path).count() == 3)
    // the cache still serves it (no retrain), and it still reads
    val hit = ModelCache.cached(docs, "scratch-artifact-v1") {
      fail("must be a cache hit"); ""
    }
    assert(hit == path)
  }
}
