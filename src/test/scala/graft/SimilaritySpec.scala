package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosine matches hand computation") {
    val df = Seq((Seq(1.0, 0.0, 1.0), Seq(1.0, 1.0, 0.0)))
      .toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("c"))
    // dot=1, |a|=|b|=sqrt2 → 0.5
    assert(math.abs(df.collect().head.getDouble(0) - 0.5) < 1e-9)
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("c"))
    assert(df.collect().head.getDouble(0) == 0.0)
  }

  test("bruteForceTopK ranks the planted nearest neighbor first") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)), // nearest to 1
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.bruteForceTopK(corpus,
      corpus.filter(col("vec_id") === 1), "vec_id", "embedding",
      "vec_id", k = 2).orderBy("rn").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L))
    assert(out.head.getAs[Double]("cos_sim") > 0.99)
  }

  test("hyperplane signature is deterministic and seed-sensitive") {
    val df = Seq((1L, Seq(1.0, 2.0, -0.5)), (2L, Seq(1.0, 2.0, -0.5)),
      (3L, Seq(-1.0, -2.0, 0.5))).toDF("id", "v")
    val sig = df.select(col("id"),
      SimilarityOps.hyperplaneSig(col("v"), 16).as("s1"),
      SimilarityOps.hyperplaneSig(col("v"), 16, seed = 7).as("s2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(sig(1L)._1 == sig(2L)._1) // same vector → same bucket
    // antipodal vector → complementary sign bits
    assert(sig(1L)._1 == (~sig(3L)._1 & ((1L << 16) - 1)))
    assert(sig(1L)._1 != sig(1L)._2) // different seed → different planes
  }

  test("lshTopK finds the planted duplicate in its bucket") {
    val corpus = (0 until 50).map { i =>
      (i.toLong, Seq.tabulate(8)(d =>
        math.sin(i * 37.0 + d * 13.0).toFloat))
    }.toDF("vec_id", "embedding")
    val dup = Seq((999L, Seq.tabulate(8)(d =>
      math.sin(7 * 37.0 + d * 13.0).toFloat)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.lshTopK(corpus.union(dup), dup, "vec_id",
      "embedding", "vec_id", k = 1, bits = 4).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("neighbor_id") == 7L)
    assert(out.head.getAs[Double]("cos_sim") > 0.999)
  }

  test("ivfTopK finds the planted near-duplicate through cell probing") {
    val corpus = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(8)(d =>
        math.cos(i * 29.0 + d * 11.0).toFloat))
    }.toDF("vec_id", "embedding")
    val probe = Seq((777L, Seq.tabulate(8)(d =>
      (math.cos(13 * 29.0 + d * 11.0) * 1.001).toFloat)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.ivfTopK(corpus.union(probe), probe,
      "vec_id", "embedding", "vec_id", k = 1, cells = 8, nprobe = 3)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("neighbor_id") == 13L)
    assert(out.head.getAs[Double]("cos_sim") > 0.999)
  }

  test("embeddingNearDups reports exact duplicates with cos 1.0") {
    val df = Seq(
      (1L, Seq(0.5f, 0.5f, 0.1f)),
      (2L, Seq(0.5f, 0.5f, 0.1f)),
      (3L, Seq(-0.5f, 0.4f, 0.9f)))
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.embeddingNearDups(df, "vec_id", "embedding",
      threshold = 0.95, bits = 4).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
  }
}
