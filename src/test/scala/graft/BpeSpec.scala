package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("vocab symbolizes words with end-of-word marker and counts") {
    val df = Seq("low low lower").toDF("text")
    val v = Bpe.vocab(df, "text").orderBy("word")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(v.toSeq == Seq(
      ("low", 2L, " l  o  w  </w> "),
      ("lower", 1L, " l  o  w  e  r  </w> ")))
  }

  test("classic low/lower/lowest merge sequence") {
    // hand-computed: pairs (l,o) and (o,w) both count 3; lexicographic
    // tie-break picks (l,o); then (lo,w) at 3; then (low,e) at 2
    val df = Seq((1L, "low lower lowest")).toDF("id", "text")
    val merges = Bpe.train(df, "text", 3)
    assert(merges.map(m => (m.step, m.left, m.right, m.cnt)) == Seq(
      (1, "l", "o", 3L),
      (2, "lo", "w", 3L),
      (3, "low", "e", 2L)))
  }

  test("merge application is greedy leftmost non-overlapping") {
    // 'aaaa' → merge1 (a,a) with sliding count 3; greedy leftmost
    // application gives (aa)(aa), so round 2 sees {(aa,aa), (aa,</w>)}
    // both at 1 and the lexicographic tie-break picks (aa,</w>)
    // ('<' < 'a'). A stalled apply (' aa a a </w>') would instead
    // leave (a,a) as round 2's lexicographic minimum.
    val df = Seq("aaaa").toDF("text")
    val merges = Bpe.train(df, "text", 2)
    assert(merges(0).left == "a" && merges(0).right == "a")
    assert(merges(0).cnt == 3L)
    assert(merges(1).left == "aa" && merges(1).right == "</w>")
  }

  test("training stops early when no pairs remain") {
    val df = Seq("a b a b").toDF("text") // single-char words
    val merges = Bpe.train(df, "text", 10)
    // each word is (char, </w>): merges exhaust quickly
    assert(merges.size < 10)
    assert(merges.nonEmpty)
  }

  test("encodeStats: token counts under the learned merges") {
    // merges after 3 steps: (l,o), (lo,w), (low,e) → symbol counts
    // low=[low,</w>]=2, lower=[lowe,r,</w>]=3, lowest=[lowe,s,t,</w>]=4
    val df = Seq((1L, "low lower lowest"), (2L, "")).toDF("id", "text")
    val st = Bpe.encodeStats(df, "id", "text", merges = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(st(0) == ((1L, 9L, 3L, 1.7778))) // 16 chars / 9 toks, 4dp
    assert(st(1) == ((2L, 0L, 0L, 0.0)))
  }

  test("encode emits per-doc token-id sequences in document order") {
    // corpus word counts: low×3, lower×1, lowest×1 → merges (l,o),
    // (lo,w), then (low,</w>) (count 3 beats (low,e)=2); final syms
    // low=[low</w>], lower=[low,e,r,</w>], lowest=[low,e,s,t,</w>];
    // distinct symbols sorted: </w>=0, e=1, low=2, low</w>=3, r=4,
    // s=5, t=6
    val df = Seq((1L, "low lower lowest"), (2L, ""),
      (3L, "low low")).toDF("id", "text")
    val enc = graft.operators.Bpe.encode(df, "id", "text", merges = 3)
      .orderBy("id").collect()
    assert(enc(0).getSeq[Int](1) == Seq(3, 2, 1, 4, 0, 2, 1, 5, 6, 0))
    assert(enc(0).getLong(2) == 10L)
    assert(enc(1).getSeq[Int](1).isEmpty && enc(1).getLong(2) == 0L)
    // repeated words repeat their id run, in order
    assert(enc(2).getSeq[Int](1) == Seq(3, 3))
  }

  test("merge-loop lineage stays bounded at large merge budgets") {
    // 40 distinct 4-char words sustain >=160 merge rules; at 50 merges
    // the vocab must have been re-materialized (every 16) so its plan
    // carries at most 16 stacked replaces, not 50
    val words = (0 until 40).map(i =>
      s"${('a' + i % 26).toChar}${('a' + (i * 7) % 26).toChar}" +
        s"${('a' + (i * 3) % 26).toChar}${('a' + (i * 11 + 5) % 26).toChar}")
    val df = Seq((words ++ words.take(13)).mkString(" ")).toDF("text")
    val (ms, v) = Bpe.trainWithVocab(df, "text", 50)
    assert(ms.size == 50)
    val plan = v.queryExecution.analyzed.toString
    val depth = "regexp_replace".r.findAllIn(plan).size
    assert(depth <= 16, s"vocab lineage carries $depth stacked replaces")
    assert(v.count() == words.distinct.size)
  }

  test("weighted counts: frequent words dominate merge choice") {
    // zzz×10: (z,z) counts 2 per occurrence = 20, beating (z,</w>)=10
    val df = Seq(("zzz " * 10) + "qx").toDF("text")
    val m = Bpe.train(df, "text", 1).head
    assert((m.left, m.right) == ("z", "z"))
    assert(m.cnt == 20L)
  }
}
