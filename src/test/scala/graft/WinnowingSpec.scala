package graft

import org.apache.spark.sql.functions._

import graft.operators.Winnowing

class WinnowingSpec extends SparkTestBase {
  import spark.implicits._

  private def fps(texts: (Long, String)*): Map[Long, Set[Long]] =
    Winnowing.fingerprints(texts.toSeq.toDF("id", "text"), "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  test("docs with fewer than K tokens emit no fingerprints") {
    val m = fps((1L, "one two"), (2L, ""), (3L, "a b c"))
    assert(!m.contains(1L) && !m.contains(2L))
    assert(m(3L).size == 1) // single k-gram → single window min
  }

  test("fingerprints are invariant to whitespace and case") {
    val m = fps(
      (1L, "Alpha beta GAMMA delta epsilon zeta eta theta"),
      (2L, "  alpha   beta gamma\tdelta epsilon zeta eta theta "))
    assert(m(1L) == m(2L))
  }

  test("winnowing guarantee: a shared run of >= W+K-1 tokens shares a fp") {
    // the paper's theorem: any common substring of at least w+k-1
    // tokens (here 6) produces at least one common selected fingerprint
    val shared = "lorem ipsum dolor sit amet consectetur"   // 6 tokens
    val m = fps(
      (1L, s"completely unrelated prefix words here $shared"),
      (2L, s"$shared and then a different suffix entirely"))
    assert(m(1L).intersect(m(2L)).nonEmpty)
  }

  test("edit outside the shared region preserves the shared fp") {
    val shared = "the quick brown fox jumps over the lazy dog today"
    val m = fps(
      (1L, s"intro one two three $shared"),
      (2L, s"totally other opening $shared closing words changed"))
    assert(m(1L).intersect(m(2L)).nonEmpty)
  }

  test("overlapPairs finds the copied pair and applies minShared") {
    val copied = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, s"$copied original framing words"),
      (2L, s"stolen intro $copied outro text"),
      (3L, "nothing in common with anyone else at all whatsoever"))
      .toDF("id", "text")
    val pairs = Winnowing.overlapPairs(df, "id", "text",
        minShared = 2, maxDocFreq = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 >= 2L)
  }

  test("maxDocFreq drops boilerplate fingerprints") {
    // the same text in 5 docs; with maxDocFreq=4 every shared fp is
    // boilerplate-dropped → no pairs at all
    val boiler = "standard footer text appears on every single page here"
    val df = (1L to 5L).map(i => (i, boiler)).toDF("id", "text")
    val pairs = Winnowing.overlapPairs(df, "id", "text",
      minShared = 1, maxDocFreq = 4)
    assert(pairs.isEmpty)
  }
}
