package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.SetSimJoin

/** Exact set-similarity join (prefix filtering): completeness vs the
  * brute-force all-pairs computation is the whole point — the prefix
  * filter must be a pure optimization, never dropping a qualifying
  * pair. */
class SetSimJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, Seq[String])], t: Double)
      : Set[(Long, Long, Double)] = {
    val sets = rows.map { case (id, s) => (id, s.toSet) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toDouble
      j = inter / (sa.size + sb.size - inter)
      if j >= t
    } yield (ia, ib, math.rint(j * 1e6) / 1e6)).toSet
  }

  private def viaJoin(rows: Seq[(Long, Seq[String])], t: Double)
      : Set[(Long, Long, Double)] = {
    val df = rows.toDF("id", "s")
    SetSimJoin.joinPairs(df, "id", "s", t)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6))
      .toSet
  }

  test("matches brute force on a hand case (dups, near-dups, disjoint)") {
    val rows = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "d"),          // exact dup of 1
      3L -> Seq("a", "b", "c", "e"),          // j=3/5=0.6 with 1,2
      4L -> Seq("x", "y", "z"),               // disjoint
      5L -> Seq("a", "x"),                    // below threshold to all
      6L -> Seq.empty[String])                // empty: never pairs
    for (t <- Seq(0.3, 0.5, 0.8, 1.0))
      assert(viaJoin(rows, t) === bruteForce(rows, t), s"t=$t")
  }

  test("duplicate elements in the input column are set-deduplicated") {
    val rows = Seq(1L -> Seq("a", "a", "b"), 2L -> Seq("b", "a"))
    assert(viaJoin(rows, 0.9) === Set((1L, 2L, 1.0)))
  }

  test("property: prefix-filtered result equals brute force") {
    val tokGen = Gen.oneOf((0 until 30).map(i => s"t$i"))
    val setGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokGen))
    val corpusGen = Gen.choose(2, 25).flatMap(n =>
      Gen.listOfN(n, setGen))
    for (i <- 0 until 20) {
      val sets = corpusGen.pureApply(Gen.Parameters.default, Seed(i))
      val rows = sets.zipWithIndex.map { case (s, id) =>
        (id.toLong, s.distinct: Seq[String]) }
      val t = Seq(0.2, 0.4, 0.6, 0.85)(i % 4)
      assert(viaJoin(rows, t) === bruteForce(rows, t),
        s"seed=$i t=$t rows=$rows")
    }
  }

  test("shingleJoin matches DedupOps shingling semantics") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words entirely here now"),
      (4L, "hi"))                       // sub-n doc: whole-list shingle
      .toDF("doc_id", "text")
    val got = SetSimJoin.shingleJoin(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // docs 1,2 share 6 of their 7+7 distinct 3-shingles: j=6/8=0.75
    assert(got === Set((1L, 2L)))
    val j = SetSimJoin.shingleJoin(docs, "doc_id", "text", 3, 0.3)
      .collect().head.getDouble(2)
    assert(math.abs(j - 0.75) < 1e-9)
  }

  test("threshold 1.0 returns exactly the identical-set pairs") {
    val rows = Seq(
      1L -> Seq("a", "b"), 2L -> Seq("b", "a"), 3L -> Seq("a", "b", "c"))
    assert(viaJoin(rows, 1.0) === Set((1L, 2L, 1.0)))
  }

  test("positional filter: prunes candidates, never drops a true pair") {
    // circulant corpus: doc i holds 8 consecutive tokens of a 25-token
    // ring, so distance-d pairs share 8-d tokens. At t=0.6 only d<=2
    // qualifies, but the prefix filter alone also admits far pairs
    // whose single shared token lands in both prefixes — the shape the
    // positional filter exists to kill
    val rows = (0L until 40L).map { i =>
      i -> (0 until 8).map(k => f"tok${(i + k) % 25}%02d")
    }
    val df = rows.toDF("id", "s")
    val t = 0.6
    val withPos = SetSimJoin
      .candidatePairs(df, "id", "s", t, positionalFilter = true).count()
    val withoutPos = SetSimJoin
      .candidatePairs(df, "id", "s", t, positionalFilter = false).count()
    info(s"candidates: $withoutPos unfiltered -> $withPos positional " +
      s"(${if (withoutPos == 0) 0 else 100 * (withoutPos - withPos) / withoutPos}% pruned)")
    assert(withPos <= withoutPos)
    assert(withPos < withoutPos,
      "positional filter should prune on this adversarial corpus")
    // and the final result is byte-identical with the filter on or off
    val on = SetSimJoin
      .joinPairsImpl(df, "id", "s", t, positionalFilter = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val off = SetSimJoin
      .joinPairsImpl(df, "id", "s", t, positionalFilter = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(on === off)
    assert(viaJoin(rows.map { case (i, s) => (i, s: Seq[String]) }, t)
      === bruteForce(rows.map { case (i, s) => (i, s: Seq[String]) }, t))
  }

  test("plan: candidate generation is an equi-join, not a cartesian") {
    val rows = (0L until 40L).map(i =>
      i -> Seq(s"t${i % 7}", s"u$i", s"v${i % 5}"))
    val df = rows.toDF("id", "s")
    val plan = SetSimJoin.joinPairs(df, "id", "s", 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"prefix join must stay an equi-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"prefix join must stay an equi-join:\n$plan")
  }
}
