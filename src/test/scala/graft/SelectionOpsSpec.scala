package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, Dsir}
import graft.ops.TokenBudget

class SelectionOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- fingerprintGroups ----------------------------------------------

  test("fingerprintGroups: whitespace variants share a group") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha   beta\tgamma"),     // same token stream
      (3L, "  alpha beta gamma  "),    // same after trim
      (4L, "alpha beta"),              // different
      (5L, "alphabeta gamma"))         // token boundary differs
      .toDF("doc_id", "text")
    val out = DedupOps.fingerprintGroups(df, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 1L), (5L, 5L, 1L)))
  }

  // ---- TokenBudget ----------------------------------------------------

  private def budgetDocs(rows: (Long, Double, Long)*) =
    rows.toSeq.toDF("id", "score", "tokens")

  private def select(df: org.apache.spark.sql.DataFrame, budget: Long) =
    TokenBudget.selectScoredToBudget(df, "id", col("score"),
        col("tokens"), budget)
      .collect().map(_.getLong(0)).toSet

  test("token budget: full high buckets + boundary prefix fill") {
    // bucket .9: 60 tokens (fits whole); bucket .8: docs 3,4,5 by id —
    // only the id-ordered prefix that fits the remaining 40 gets in
    val df = budgetDocs(
      (1L, 0.9, 30L), (2L, 0.9, 30L),
      (3L, 0.8, 25L), (4L, 0.8, 20L), (5L, 0.8, 10L))
    // budget 100: bucket .9 full (60); boundary .8 remaining 40:
    // doc3 (25, cum 25) in; doc4 (20, cum 45 > 40) out — and the
    // prefix STOPS there: doc5 (10) would fit but follows the overflow
    assert(select(df, 100L) == Set(1L, 2L, 3L))
  }

  test("token budget: all fit / none fit edges") {
    val df = budgetDocs((1L, 0.5, 10L), (2L, 0.7, 10L))
    assert(select(df, 100L) == Set(1L, 2L))
    assert(select(df, 5L) == Set.empty[Long])
  }

  test("token budget: exact boundary doc is admitted (<= semantics)") {
    val df = budgetDocs((1L, 0.9, 50L), (2L, 0.8, 50L), (3L, 0.7, 50L))
    assert(select(df, 100L) == Set(1L, 2L))
  }

  // ---- DSIR importance weights ----------------------------------------

  test("dsir: target-only bigrams score positive, background negative") {
    val target = (1L to 5L).map(i =>
      (i, "clean medical journal article text", true))
    val bg = (6L to 10L).map(i =>
      (i, "spam casino jackpot winner click", false))
    val df = (target ++ bg).toDF("id", "text", "is_t")
    val w = Dsir.importanceWeights(df, "id", "text", col("is_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    // 4 bigram occurrences per doc
    assert(w.forall(_._2 == 4L))
    val (tW, bW) = (w.filter(_._1 <= 5L).map(_._3),
      w.filter(_._1 > 5L).map(_._3))
    assert(tW.forall(_ > 0.0), s"target weights $tW")
    assert(bW.forall(_ < 0.0), s"background weights $bW")
    // all target docs identical text → identical weight
    assert(tW.distinct.size == 1)
  }

  test("dsir: docs without bigrams get weight 0 and stay in output") {
    val df = Seq((1L, "single", false), (2L, "", false),
      (3L, "a b c", true)).toDF("id", "text", "is_t")
    val w = Dsir.importanceWeights(df, "id", "text", col("is_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(w.map(_._1) == Seq(1L, 2L, 3L))
    assert(w.take(2).forall(x => x._2 == 0L && x._3 == 0.0))
    assert(w(2)._2 == 2L)
  }

  test("dsir feature bucket is stable and in range") {
    val b = Seq("alpha beta", "beta gamma", "alpha beta")
      .toDF("bg").select(Dsir.featBucket(col("bg")).as("b"))
      .collect().map(_.getLong(0))
    assert(b(0) == b(2))
    assert(b.forall(x => x >= 0 && x < Dsir.Buckets))
  }
}
