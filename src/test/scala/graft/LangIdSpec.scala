package graft

import org.apache.spark.sql.functions._

import graft.functions.CharNgrams
import graft.operators.LangId

class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  test("char_ngrams: code-point trigrams, short/empty fallbacks") {
    val out = Seq("abcd", "ab", "", "héllo", "中文字符")
      .toDF("t")
      .select(CharNgrams.column(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("abc", "bcd"))
    assert(out(1) == List("ab"))      // shorter than n → whole text
    assert(out(2) == Nil)             // empty → empty
    // multi-byte code points count as ONE character
    assert(out(3) == List("hél", "éll", "llo"))
    assert(out(4) == List("中文字", "文字符"))
  }

  test("trained langid separates held-out docs by character profile") {
    // two synthetic "languages" with disjoint character distributions
    val aa = (1 to 10).map(i => ("aa", s"arka bale cado dent $i era"))
    val zz = (1 to 10).map(i => ("zz", s"zyx wvu tsrq pon $i mlk"))
    val train = (aa ++ zz).toDF("lang", "text")
    val profiles = LangId.trainProfiles(train, "lang", "text", m = 50)
    assert(profiles.groupBy("lang").count().collect()
      .forall(_.getLong(1) <= 50))
    val test = Seq(
      (1L, "bale dent cado era arka"),   // aa-shaped
      (2L, "pon zyx mlk wvu tsrq"))      // zz-shaped
      .toDF("doc_id", "text")
    val preds = LangId.classify(test, "doc_id", "text", profiles,
        k = 50, m = 50)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(1L -> "aa", 2L -> "zz"))
  }

  test("classification is deterministic under repartitioning") {
    val docs = Seq(
      ("en", "the quick brown fox jumps over the lazy dog"),
      ("de", "der schnelle braune fuchs springt ueber den faulen hund"),
      ("en", "a stitch in time saves nine says the proverb"),
      ("de", "uebung macht den meister sagt das sprichwort"))
      .toDF("lang", "text")
    val profiles = LangId.trainProfiles(docs, "lang", "text", m = 80)
    val held = Seq((1L, "the fox and the hound say hello"),
      (2L, "der hund und der fuchs sagen hallo")).toDF("doc_id", "text")
    def run(p: Int) = LangId.classify(held.repartition(p),
        "doc_id", "text", profiles, k = 40, m = 80)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run(1) == run(7))
    assert(run(1).map(x => x._1 -> x._2) == Seq(1L -> "en", 2L -> "de"))
  }
}
