package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupClusters

class DedupClustersSpec extends SparkTestBase {
  import spark.implicits._

  test("components refuses to emit labels when maxIter preempts convergence") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      DedupClusters.components(pairs, "a", "b", maxIter = 1)
    }
    assert(e.getMessage.contains("converge"))
  }

  test("components resolves chains transitively (A~B, B~C => one cluster)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val out = DedupClusters.components(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("components handles a long chain (worst case for label prop)") {
    val n = 200L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val out = DedupClusters.components(pairs, "a", "b")
      .as[(Long, Long)].collect()
    assert(out.length == n)
    assert(out.forall(_._2 == 0L), "every node must resolve to the min")
  }

  test("components is orientation- and duplicate-insensitive") {
    val pairs = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (2L, 3L))
      .toDF("a", "b")
    val out = DedupClusters.components(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("components on a star graph and a clique") {
    val star = (2L to 6L).map(i => (7L, i)).toDF("a", "b") // hub 7
    val clique = (for { i <- 20L to 23L; j <- 20L to 23L if i < j }
      yield (i, j)).toDF("a", "b")
    val out = DedupClusters.components(star.unionByName(clique), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((2L to 7L).forall(out(_) == 2L))
    assert((20L to 23L).forall(out(_) == 20L))
  }

  test("clusters assigns singletons to themselves") {
    val ids = (1L to 8L).toDF("id")
    val pairs = Seq((3L, 5L)).toDF("a", "b")
    val out = DedupClusters.clusters(ids, "id", pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out(3L) == 3L && out(5L) == 3L)
    assert(Seq(1L, 2L, 4L, 6L, 7L, 8L).forall(i => out(i) == i))
  }

  test("clusters with no pairs at all is the identity") {
    val ids = (1L to 5L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val out = DedupClusters.clusters(ids, "id", pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(out == (1L to 5L).map(i => i -> i).toMap)
  }

  test("bestRepresentatives keeps the quality argmax, id-asc on ties") {
    // cluster {1,2,3}: doc 2 has top quality; cluster {4,5}: tie →
    // smaller id 4 wins; 6 is a singleton and keeps itself
    val scored = Seq((1L, 0.3), (2L, 0.9), (3L, 0.5), (4L, 0.7),
      (5L, 0.7), (6L, 0.1)).toDF("id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("a", "b")
    val out = DedupClusters
      .bestRepresentatives(scored, "id", pairs, "a", "b")
      .as[(Long, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    assert(out(1L) == ((1L, 2L, false)))
    assert(out(2L) == ((1L, 2L, true)))
    assert(out(3L) == ((1L, 2L, false)))
    assert(out(4L) == ((4L, 4L, true)))
    assert(out(5L) == ((4L, 4L, false)))
    assert(out(6L) == ((6L, 6L, true)))
  }

  test("clusterMap artifact: computed once per session, reused, durable") {
    // back the corpus with files so the ModelCache snapshot key
    // engages (a LocalRelation would also work, but the file path is
    // the production shape)
    val dir = java.nio.file.Files.createTempDirectory("cmap").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // near-dup of 1
      (3L, "completely different text entirely here"))
      .toDF("doc_id", "text").write.parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")
    val m1 = DedupClusters.clusterMap(docs, "doc_id", "text")
    val m2 = DedupClusters.clusterMap(docs, "doc_id", "text")
    // same session + unchanged snapshot: both reads come from the SAME
    // materialized artifact — the closure ran once
    assert(m1.inputFiles.sorted.sameElements(m2.inputFiles.sorted))
    val lab = m1.as[(Long, Long)].collect().toMap
    assert(lab(1L) == lab(2L) && lab(3L) != lab(1L))
    // durable publish: a versioned table other sessions time-travel
    val v = DedupClusters.publishClusterMap(
      docs, "doc_id", "text", s"$dir/artifact")
    assert(v == 1)
    val back = graft.core.VersionedTable
      .read(spark, s"$dir/artifact")
      .as[(Long, Long)].collect().toMap
    assert(back == lab)
    // consumers over the artifact equal the recomputing form
    val scored = docs.select(col("doc_id"),
      functions.TextFunctions.qualityScore(col("text")).as("quality"))
    val viaArtifact = DedupClusters
      .bestRepresentativesFrom(scored, "doc_id", back.toSeq
        .toDF("doc_id", "cluster_id"))
      .orderBy("doc_id").collect().toSeq
    val pairs = graft.operators.DedupOps.minhashNearDups(
      docs, "doc_id", "text", threshold = 0.95)
    val direct = DedupClusters
      .bestRepresentatives(scored, "doc_id", pairs, "id_a", "id_b")
      .orderBy("doc_id").collect().toSeq
    assert(viaArtifact == direct)
  }

  test("incremental cluster admission equals the full recompute") {
    // old corpus: cluster {1,2} (near-dups), singletons 3 and 4.
    // batch exercises every admission shape: 10 dups doc 1 (joins
    // the existing {1,2} cluster), 11 dups doc 3 (upgrades a
    // singleton to a cluster), 12 and 13 dup each other (a brand-new
    // cluster), and 14 is edge-free (stays a singleton)
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "one two three four five six seven eight nine"
    val tC = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    val tD = "pack my box with five dozen brown liquor jugs today"
    val old = Seq(1L -> tA, 2L -> tA, 3L -> tB, 4L -> tC)
      .toDF("doc_id", "text")
    val batch = Seq(10L -> tA, 11L -> tB, 12L -> tD, 13L -> tD,
      14L -> "entirely novel content nothing like the rest at all")
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ic").toString
    val path = s"$dir/artifact"
    graft.operators.IncrementalClusters.publish(
      old, "doc_id", "text", path)
    graft.operators.IncrementalClusters.update(
      batch, old, "doc_id", "text", path)
    val incr = graft.operators.IncrementalClusters.read(spark, path)
      .as[(Long, Long)].collect().toMap
    // full recompute over old ∪ batch
    val all = old.unionByName(batch)
    val pairs = graft.operators.DedupOps.minhashNearDups(
      all, "doc_id", "text", threshold = 0.95)
    val full = DedupClusters.clusters(all.select(col("doc_id")),
      "doc_id", pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(incr == full)
    // spot semantics: merge into old cluster, new-new cluster,
    // singleton carry-over
    assert(incr(10L) == 1L && incr(1L) == 1L && incr(2L) == 1L)
    assert(incr(11L) == 3L)
    assert(incr(12L) == 12L && incr(13L) == 12L)
    assert(incr(14L) == 14L && incr(4L) == 4L)
    // version history: publish=v1, update=v2; v1 still readable
    assert(graft.operators.IncrementalClusters
      .read(spark, path, Some(1)).count() == 4)
  }

  test("streaming admission maintains the map across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "one two three four five six seven eight nine"
    val root = java.nio.file.Files.createTempDirectory("ics").toString
    val path = s"$root/artifact"
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(graft.operators.IncrementalClusters
        .foreachBatchAdmit(path, "doc_id", "text"))
      .start()
    try {
      // batch 0 publishes: {1,2} near-dups, 3 singleton
      mem.addData(1L -> tA, 2L -> tA, 3L -> tB)
      q.processAllAvailable()
      val m0 = graft.operators.IncrementalClusters.read(spark, path)
        .as[(Long, Long)].collect().toMap
      assert(m0 == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
      // batch 1 updates: 10 joins {1,2}, 11 pairs with 3, 12 alone
      mem.addData(10L -> tA, 11L -> tB,
        12L -> "totally new content unlike anything previously seen")
      q.processAllAvailable()
      val m1 = graft.operators.IncrementalClusters.read(spark, path)
        .as[(Long, Long)].collect().toMap
      assert(m1 == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 10L -> 1L,
        11L -> 3L, 12L -> 12L))
      // replaying an admitted batch is a no-op (marker protocol):
      // same batch id, new versions must NOT appear
      val vBefore = graft.core.VersionedTable
        .latestVersion(spark, s"$path/clusters")
      graft.operators.IncrementalClusters
        .foreachBatchAdmit(path, "doc_id", "text")(
          Seq(10L -> tA).toDF("doc_id", "text"), 1L)
      assert(graft.core.VersionedTable
        .latestVersion(spark, s"$path/clusters") == vBefore)
    } finally q.stop()
  }
}
