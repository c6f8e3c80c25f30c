package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{TopKByScore, TopKState}
import graft.operators.BloomJoin

class TopKBloomSpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i =>
      gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- TopKState unit laws (no Spark needed) -------------------------

  test("TopKState keeps exactly the k best, ordered (score desc, id asc)") {
    val st = new TopKState(3)
    Seq(1.0 -> 10L, 5.0 -> 20L, 3.0 -> 30L, 5.0 -> 5L, 0.5 -> 40L)
      .foreach { case (s, i) => st.insert(s, i) }
    val got = st.sortedIdx.map(i => (st.scores(i), st.ids(i))).toSeq
    assert(got == Seq((5.0, 5L), (5.0, 20L), (3.0, 30L)))
  }

  test("heap property law: state top-k == sort-then-take for any stream") {
    val entries = Gen.listOf(Gen.zip(
      Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 50L)))
    for (((xs, k), i) <- samples(Gen.zip(entries, Gen.chooseNum(1, 8)), 200)
           .zipWithIndex) {
      val st = new TopKState(k)
      xs.foreach { case (s, id) => st.insert(s, id) }
      val got = st.sortedIdx.map(j => (st.scores(j), st.ids(j))).toSeq
      // the heap keeps duplicates like the window formulation does
      val want = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      assert(got == want, s"sample $i: k=$k xs=$xs")
    }
  }

  test("merge law: merged partials == single-state result") {
    val entries = Gen.listOf(Gen.zip(
      Gen.chooseNum(-10.0, 10.0), Gen.chooseNum(0L, 20L)))
    for (((xs, ys), i) <- samples(Gen.zip(entries, entries), 200)
           .zipWithIndex) {
      val whole = new TopKState(4)
      (xs ++ ys).foreach { case (s, id) => whole.insert(s, id) }
      val a = new TopKState(4)
      xs.foreach { case (s, id) => a.insert(s, id) }
      val b = new TopKState(4)
      ys.foreach { case (s, id) => b.insert(s, id) }
      a.merge(b)
      val gw = whole.sortedIdx.map(j => (whole.scores(j), whole.ids(j))).toSeq
      val gm = a.sortedIdx.map(j => (a.scores(j), a.ids(j))).toSeq
      assert(gw == gm, s"sample $i")
    }
  }

  // ---- aggregate vs window equivalence on a real plan -----------------

  test("TopKByScore agg matches the row_number window formulation") {
    val rows = (1L to 500L).map(i =>
      (s"g${i % 7}", i, (i * 2654435761L % 1000) / 1000.0))
    val df = rows.toDF("grp", "id", "score")
    val agg = df.groupBy(col("grp"))
      .agg(TopKByScore.column(col("score"), col("id"), 5).as("t"))
      .select(col("grp"), posexplode(col("t")).as(Seq("p", "e")))
      .select(col("grp"), col("e.id").as("id"),
        col("e.score").as("score"), (col("p") + 1).as("rn"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("id"))
    val win = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("grp"), col("id"), col("score"), col("rn").cast("long"))
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
  }

  test("TopKByScore plans as ObjectHashAggregate with no Window") {
    val df = (1L to 100L).map(i => (s"g${i % 3}", i, i / 7.0))
      .toDF("grp", "id", "score")
      .groupBy(col("grp"))
      .agg(TopKByScore.column(col("score"), col("id"), 3).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected map-side-capable ObjectHashAggregate, got:\n$plan")
    assert(!plan.contains("Window"), "top-k must not plan a window")
  }

  test("NaN scores rank first (Spark's desc double order) in any " +
      "arrival order") {
    // raw < comparisons are all-false on NaN, which would corrupt the
    // heap and make the result depend on arrival order
    val perms = Seq(
      Seq(Double.NaN -> 1L, 1.0 -> 2L, 2.0 -> 3L),
      Seq(2.0 -> 3L, 1.0 -> 2L, Double.NaN -> 1L),
      Seq(1.0 -> 2L, Double.NaN -> 1L, 2.0 -> 3L))
    for (xs <- perms) {
      val st = new TopKState(2)
      xs.foreach { case (s, i) => st.insert(s, i) }
      val ids = st.sortedIdx.map(i => st.ids(i)).toSeq
      assert(ids == Seq(1L, 3L), s"arrival order $xs gave $ids")
    }
  }

  test("-0.0 and 0.0 scores are one SQL-equal group, tie-broken by id") {
    val st = new TopKState(3)
    st.insert(-0.0, 5L); st.insert(0.0, 2L); st.insert(-1.0, 1L)
    val got = st.sortedIdx.map(i => st.ids(i)).toSeq
    assert(got == Seq(2L, 5L, 1L))
  }

  // ---- bloom join -----------------------------------------------------

  test("bloom join refuses non-integral keys instead of silently " +
      "pruning everything") {
    val fact = (1L to 10L).map(i => (i, i)).toDF("fk", "payload")
    val dim = Seq(("1", "a"), ("2", "b")).toDF("dk", "name")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.join(fact, "fk", dim, "dk")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("bloom join supports same-named keys on both sides") {
    val fact = (1L to 100L).map(i => (i, i)).toDF("k", "payload")
    val dim = (1L to 100L by 9).map(i => (i, s"d$i")).toDF("k", "name")
    assert(BloomJoin.join(fact, "k", dim, "k").count() == 12)
  }

  test("BloomJoin.join result is identical to the plain inner join") {
    val fact = (1L to 2000L).map(i => (i, i % 97)).toDF("fk", "payload")
    val dim = (1L to 2000L by 13).map(i => (i, s"d$i")).toDF("dk", "name")
    val got = BloomJoin.join(fact, "fk", dim, "dk")
      .select("fk", "payload", "dk", "name")
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "dk", "name")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("bloom pruning filters at the scan, below the join exchange") {
    // a real file scan — over a LocalRelation Catalyst constant-folds
    // the probe away entirely, which hides the plan shape under test
    val dir = java.nio.file.Files.createTempDirectory("bloomfact")
      .toString + "/fact"
    (1L to 1000L).map(i => (i, i)).toDF("fk", "payload")
      .write.parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Seq((5L, "a"), (10L, "b")).toDF("dk", "name")
    val pruned = BloomJoin.prunedFact(fact, "fk", dim, "dk")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"probe expression missing from plan:\n$plan")
    assert(!plan.contains("Exchange"),
      "pruning must be a narrow filter — no exchange")
    // selective dim ⇒ the sketch really prunes (2 keys + fp ≪ 1000)
    assert(pruned.count() < 100)
  }

  test("bloom pruning never drops a matching row (no false negatives)") {
    val fact = (1L to 5000L).map(i => (i, i)).toDF("fk", "payload")
    val dim = (1L to 5000L by 7).map(i => (i, i)).toDF("dk", "x")
    val prunedKeys = BloomJoin.prunedFact(fact, "fk", dim, "dk")
      .select("fk").as[Long].collect().toSet
    val dimKeys = (1L to 5000L by 7).toSet
    assert(dimKeys.subsetOf(prunedKeys))
  }

  // ---- deterministic splits -------------------------------------------

  test("split assignment is deterministic and ~80/10/10") {
    val docs = (1L to 4000L).toDF("doc_id")
    val once = graft.ops.Splits.assign(docs, col("doc_id"), "graft")
    val twice = graft.ops.Splits.assign(docs, col("doc_id"), "graft")
    assert(once.except(twice).isEmpty)
    val frac = once.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 4000.0).toMap
    assert(math.abs(frac("train") - 205.0 / 256) < 0.03)
    assert(math.abs(frac("val") - 25.0 / 256) < 0.02)
    assert(math.abs(frac("test") - 26.0 / 256) < 0.02)
    // a different seed reshuffles the assignment
    val reseeded = graft.ops.Splits.assign(docs, col("doc_id"), "other")
    assert(once.except(reseeded).count() > 0)
  }

  test("leakage-safe split keeps every near-dup cluster in one split") {
    // 40 distinct docs + 8 planted near-identical pairs: per-doc
    // hashing WOULD split some pair across train/val eventually; the
    // cluster-unit split must never
    val base = (0 until 40).map(i =>
      (i.toLong, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val dups = (0 until 8).map(i =>
      (1000L + i, s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val docs = (base ++ dups).toDF("doc_id", "text")
    val out = graft.ops.Splits.leakageSafe(
      docs, "doc_id", "text", seed = "graft", threshold = 0.9)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 48)
    // every cluster is split-homogeneous
    out.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cl spans splits: ${members.toSeq}")
    }
    // the planted pairs actually clustered (the property isn't vacuous)
    (0 until 8).foreach { i =>
      val a = out.find(_._1 == i.toLong).get
      val b = out.find(_._1 == 1000L + i).get
      assert(a._2 == b._2, s"pair $i not clustered")
      assert(a._3 == b._3)
    }
  }
}
