package graft

import org.apache.spark.sql.functions._

import graft.operators.HashingVectorizer

class HashingVectorizerSpec extends SparkTestBase {
  import spark.implicits._

  test("bucket matches the md5-prefix formula by hand") {
    // md5("spark") = 98f11b7a7880169c3bd62a5a507b3965 → 0x98f11b7a
    val b = Seq(Tuple1("spark")).toDF("t")
      .select(HashingVectorizer.bucket(col("t"), 64).as("b"))
      .collect().head.getLong(0)
    assert(b == java.lang.Long.parseLong("98f11b7a", 16) % 64)
  }

  test("vectors are L2-normalized and bucket-bounded") {
    val docs = Seq((1L, "a b c a"), (2L, "d e f"), (3L, ""))
      .toDF("doc_id", "text")
    val v = HashingVectorizer.hashedTfIdf(docs, "doc_id", "text", 16)
      .collect()
    assert(v.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
    val norms = v.groupBy(_.getLong(0)).map { case (_, rows) =>
      rows.map(r => math.pow(r.getDouble(2), 2)).sum
    }
    // rounded weights: norm² within rounding tolerance of 1
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-4))
    // the empty doc vectorizes to nothing, not a crash
    assert(!v.exists(_.getLong(0) == 3L))
  }

  test("dense vectors feed the IVF stack: planted dup found via cells") {
    // text → hashed vectors → the embedding ANN path: the scale route
    // for text similarity (textTopK is the exhaustive baseline)
    val docs = (0 until 40).map(i =>
      (i.toLong, s"tok${i % 7} tok${(i * 3) % 11} tok${(i * 5) % 13}"))
      .toDF("doc_id", "text")
      .union(Seq((1000L, "tok0 tok0 tok0")).toDF("doc_id", "text"))
    val vecs = graft.operators.HashingVectorizer
      .denseVectors(docs, "doc_id", "text", dim = 32)
    assert(vecs.select(size(col("vec"))).distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(32))
    val hits = graft.operators.SimilarityOps.ivfTopK(
      vecs, vecs.filter(col("doc_id") === 1000L), "doc_id", "vec",
      "doc_id", k = 3, cells = 4, nprobe = 2, trainIters = 1)
      .collect()
    // doc 0's text is tok0 tok0 tok0's nearest lexical neighborhood
    // (same dominant token); the probe must surface a tok0 document
    val top = hits.filter(_.getAs[Int]("rn") == 1).head
      .getAs[Long]("neighbor_id")
    assert(Seq(0L, 7L, 14L, 21L, 28L, 35L).contains(top),
      s"nearest=$top not a tok0 doc")
  }

  test("textTopK ranks an exact duplicate first with cosine 1") {
    val docs = Seq(
      (0L, "big table scan fast"),
      (1L, "small join slow query"),
      (100L, "big table scan fast"), // planted dup of doc 0
      (101L, "window agg group sort"),
      (102L, "stream batch merge row"))
      .toDF("doc_id", "text")
    val top = HashingVectorizer.textTopK(docs, "doc_id", "text",
      q => q < 2, k = 2, dim = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3)))
    val q0 = top.filter(_._1 == 0L).sortBy(_._4)
    assert(q0.head._2 == 100L && q0.head._3 == 1.0,
      s"dup not ranked first: ${q0.toSeq}")
    // doc 1 shares no tokens with anything: all its cosines are < 1
    // and present (zero-overlap pairs still emitted)
    val q1 = top.filter(_._1 == 1L)
    assert(q1.length == 2 && q1.forall(_._3 < 1.0))
  }
}
