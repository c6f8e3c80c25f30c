package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.DedupOps

class TextDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens/tokenCount handle blanks and multi-space") {
    val df = Seq("one two  three", "", "   ", "single")
      .toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 0, 0, 1))
  }

  test("bpeish count splits letter/digit/punct runs") {
    val df = Seq("abc123, def!").toDF("text")
      .select(TextFunctions.bpeishCount(col("text")).as("n"))
    // abc | 123 | , | def | ! → 5
    assert(df.collect().head.getInt(0) == 5)
  }

  test("quality score is in [0,1] and penalizes degenerate text") {
    val df = Seq(
      ("good", "The quick brown fox jumps over the lazy dog near the river bank today." * 4),
      ("repeat", "spam spam spam spam spam spam spam spam spam spam " * 10),
      ("punct", "!!! ??? !!! ??? !!! ??? !!! ???"))
      .toDF("k", "text")
      .select(col("k"), TextFunctions.qualityScore(col("text")).as("q"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(m("good") > m("repeat"), s"good=${m("good")} repeat=${m("repeat")}")
    assert(m("good") > m("punct"))
  }

  test("langId identifies clear-cut samples") {
    val df = Seq(
      ("en", "the cat and the dog sat in the garden with the children"),
      ("es", "el perro y la gata de la casa que estaba en una calle"),
      ("de", "der Hund und die Katze ist nicht mit einem Ball im Garten"),
      ("fr", "le chien et la chatte est dans les jardins du village une fois"),
      ("zh", "这 是 一个 中文 句子 测试 文档 内容"))
      .toDF("expected", "text")
      .withColumn("pred", TextFunctions.langId(col("text")))
    val rows = df.collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(2),
      s"expected ${r.getString(0)} got ${r.getString(2)}"))
  }

  test("langId is total and deterministic over the testdata corpus") {
    // the synthetic docs are English-vocab word salad regardless of
    // their `lang` label, so label agreement is not meaningful; assert
    // totality, determinism and that the English vocabulary dominates
    val doc = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("pred", TextFunctions.langId(col("text")))
    assert(doc.filter(col("pred").isNull).count() == 0)
    val dist = doc.groupBy("pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist.getOrElse("en", 0L) > doc.count() / 2, s"dist=$dist")
    val again = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("pred", TextFunctions.langId(col("text")))
    assert(doc.select("doc_id", "pred").orderBy("doc_id").collect().toSeq
      == again.select("doc_id", "pred").orderBy("doc_id").collect().toSeq)
  }

  test("fingerprint is whitespace-invariant but order-sensitive") {
    val df = Seq(("a", "hello  world"), ("b", " hello world "),
      ("c", "world hello")).toDF("k", "text")
      .select(col("k"), TextFunctions.fingerprint(col("text")).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
  }

  test("exactDedup groups identical content") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = DedupOps.exactDedup(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 1L)))
  }

  test("jaccard matches hand-computed value") {
    val df = Seq((Seq("a b c", "b c d"), Seq("b c d", "c d e")))
      .toDF("x", "y")
      .select(DedupOps.jaccard(col("x"), col("y")).as("j"))
    // intersection {b c d} = 1, union = 3 → 1/3
    assert(math.abs(df.collect().head.getDouble(0) - 1.0 / 3) < 1e-9)
  }

  test("minhashNearDups finds planted near-duplicates, not unrelated") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val nearDup = base.replace("sigma", "SIGMA2") // 1-word edit
    val unrelated = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDups(docs, "doc_id", "text",
      shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.5)
  }

  test("incrementalNearDups == full self-join restricted to new pairs") {
    // the incremental path must agree with the batch path: pairs that
    // touch a new doc (new×corpus and new×new) match minhashNearDups
    // on the whole corpus, filtered to those pair shapes
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val store = DedupOps.signatureStore(corpus, "doc_id", "text")
    val incr = DedupOps.incrementalNearDups(batch, corpus, store,
      "doc_id", "text", threshold = 0.9)
      .select(col("id_new"), col("id_dup"), col("jaccard"))
    val full = DedupOps.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.9)
    // full emits (min,max); incremental emits (new,old) for corpus
    // matches — canonicalize both to the unordered pair
    def canon(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
      df.select(least(col(a), col(b)).as("lo"),
        greatest(col(a), col(b)).as("hi"), col("jaccard"))
    val want = canon(full, "id_a", "id_b")
      .filter(col("lo") % 5 === 0 || col("hi") % 5 === 0)
    val got = canon(incr, "id_new", "id_dup")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    assert(got.count() > 0, "sf0.001 should contain planted near-dups " +
      "crossing the batch/corpus split")
  }

  test("incremental store reuse: second batch sees first batch's docs " +
      "only via an updated store") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq((10L, base)).toDF("doc_id", "text")
    val b1 = Seq((21L, base.replace("sigma", "SIGMA2"))).toDF("doc_id", "text")
    val b2 = Seq((32L, base.replace("alpha", "ALPHA2"))).toDF("doc_id", "text")
    val store0 = DedupOps.signatureStore(corpus, "doc_id", "text")
    // admit batch 1, then append its signatures to the store
    val r1 = DedupOps.incrementalNearDups(b1, corpus, store0,
      "doc_id", "text", threshold = 0.5).collect()
    assert(r1.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((21L, 10L)))
    val store1 = store0.unionByName(
      DedupOps.signatureStore(b1, "doc_id", "text"))
    val corpus1 = corpus.unionByName(b1)
    val r2 = DedupOps.incrementalNearDups(b2, corpus1, store1,
      "doc_id", "text", threshold = 0.5)
      .orderBy("id_dup").collect()
    // batch 2's doc matches BOTH standing docs now
    assert(r2.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((32L, 10L), (32L, 21L)))
    assert(r2.forall(_.getString(3) == "corpus"))
  }

  test("simhash near-identical docs have small hamming distance") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok30", "changed")
    val far = (100 to 160).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "text")
      .select(col("doc_id"), DedupOps.simhash64(col("text")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)),
      s"near=${ham(m(1L), m(2L))} far=${ham(m(1L), m(3L))}")
    assert(ham(m(1L), m(2L)) <= 8)
  }

  test("minhash signature agreement estimates jaccard (the estimator " +
    "property the linear-probe scheme violated)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.MinHashSignature
    def sig(ss: Seq[String]) = {
      val a = new GenericArrayData(
        ss.map(UTF8String.fromString).toArray[Any])
      val s = MinHashSignature.signature(a, 256)
      (0 until 256).map(s.getLong)
    }
    // across several disjoint vocabularies: |A∩B|=87, |A∪B|=90 →
    // expected per-position agreement = 87/90 ≈ 0.967
    for (seed <- 1 to 5) {
      val shared = (1 to 87).map(i => s"s$seed-shared-$i")
      val a = shared ++ Seq(s"s$seed-ua1", s"s$seed-ua2")
      val b = shared ++ Seq(s"s$seed-ub1")
      val agree = sig(a).zip(sig(b)).count(t => t._1 == t._2) / 256.0
      assert(agree > 0.85 && agree <= 1.0,
        s"seed $seed: agreement $agree far from jaccard 0.967")
    }
  }

  test("shingles native expression matches expected n-grams") {
    val df = Seq("a b c d", "a b", "x").toDF("text")
      .select(DedupOps.shingles(col("text"), 3).as("sh"))
    val out = df.collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(
      List("a b c", "b c d"),
      List("a b"), // fewer tokens than n → single joined shingle
      List("x")))
  }
}
