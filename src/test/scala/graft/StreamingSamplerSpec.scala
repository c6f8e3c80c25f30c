package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.VersionedTable
import graft.ops.DeterministicSample

/** Streaming A-ES reservoir: the maintained sample must equal a
  * full-corpus weightedTopK over everything ingested, regardless of
  * batch split; updates are idempotent (replay + crash-replay). */
class StreamingSamplerSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = (1L to 400L)
    .map(i => (i, 0.5 + (i % 7).toDouble)).toDF("id", "w")

  private def freshPath(): String = {
    val p = graft.core.Scratch.root(corpus) +
      s"/reservoir_${java.util.UUID.randomUUID()}"
    graft.core.Scratch.registerForCleanup(p)
    p
  }

  private def sample(path: String) =
    DeterministicSample.reservoir(spark, path, "id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .toSeq

  test("maintained reservoir equals the full-corpus draw under any " +
    "batch split") {
    val expected = DeterministicSample.weightedTopK(corpus, "id", "w",
        k = 25, seed = "s7")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .toSeq

    def run(splits: Seq[DataFrame]): Seq[(Long, Double, Int)] = {
      val p = freshPath()
      val sink = DeterministicSample.foreachBatchReservoir(p, "id", "w",
        k = 25, seed = "s7")
      splits.zipWithIndex.foreach { case (b, i) => sink(b, i.toLong) }
      sample(p)
    }
    val byRange = run(Seq(corpus.filter($"id" <= 150),
      corpus.filter($"id" > 150 && $"id" <= 300),
      corpus.filter($"id" > 300)))
    val byMod = run(Seq(corpus.filter($"id" % 3 === 0),
      corpus.filter($"id" % 3 === 1),
      corpus.filter($"id" % 3 === 2)))
    assert(byRange == expected, "range split diverged from recompute")
    assert(byMod == expected, "mod split diverged from recompute")
  }

  test("replay and crash-replay are no-ops on the sample content") {
    val p = freshPath()
    val sink = DeterministicSample.foreachBatchReservoir(p, "id", "w",
      k = 10, seed = "s")
    sink(corpus.filter($"id" <= 200), 0L)
    sink(corpus.filter($"id" > 200), 1L)
    val before = sample(p)
    val vBefore = VersionedTable.latestVersion(spark, p)

    sink(corpus.filter($"id" > 200), 1L) // done-marker replay: no-op
    assert(VersionedTable.latestVersion(spark, p) == vBefore)

    // crash between overwrite and marker: lose the marker, re-apply —
    // id-dedup makes the merge idempotent, content must not change
    val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$p/_commits/b1"), false)
    sink(corpus.filter($"id" > 200), 1L)
    assert(sample(p) == before,
      "crash-replay changed the reservoir content")
  }

  test("non-positive weights never enter the reservoir") {
    val p = freshPath()
    val withBad = corpus.unionByName(
      Seq((9001L, 0.0), (9002L, -3.0)).toDF("id", "w"))
    DeterministicSample.foreachBatchReservoir(p, "id", "w", k = 50,
      seed = "s")(withBad, 0L)
    assert(sample(p).forall(_._1 < 9000L))
  }
}
