package graft

import org.apache.spark.sql.functions._

import graft.ops.Boilerplate

/** Line-level boilerplate removal: classification boundaries, exact
  * reassembly, and the degenerate shapes (all-boiler, single-line,
  * empty). */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private def cleanOne(text: String, minTokens: Int = 4,
      minStop: Double = 0.2): (Long, Long, String) = {
    val r = Boilerplate.clean(Seq((1L, text)).toDF("id", "text"),
      "text", minTokens, minStop).collect().head
    (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
      r.getAs[String]("clean_text"))
  }

  test("keeps prose, drops chrome, preserves order and content") {
    val page = Seq(
      "home products about contact",         // 4 toks, 0 stopwords
      "the quick fox is in the garden today", // prose
      "nav menu login",                       // short
      "it is a fine day for a walk in the park" // prose
    ).mkString("\n")
    val (n, k, cleaned) = cleanOne(page)
    assert(n === 4L && k === 2L)
    assert(cleaned ===
      "the quick fox is in the garden today\n" +
        "it is a fine day for a walk in the park")
  }

  test("boundaries: token minimum and stopword ratio are inclusive") {
    // exactly minTokens tokens, exactly 0.25 >= 0.2 stop ratio → keep
    assert(cleanOne("the cat sat down")._2 === 1L)
    // 4 tokens but zero stopwords → drop
    assert(cleanOne("cat sat down fast")._2 === 0L)
    // 3 tokens, all stopwords → drop (token minimum)
    assert(cleanOne("the of and")._2 === 0L)
  }

  test("degenerate pages: all-boiler joins to empty, empty text") {
    val (n, k, cleaned) = cleanOne("nav one\nnav two")
    assert(n === 2L && k === 0L && cleaned === "")
    val (n2, k2, c2) = cleanOne("")
    assert(n2 === 1L && k2 === 0L && c2 === "")
  }

  test("fixture: every page mixes kept and dropped lines as designed") {
    val cleaned = Boilerplate.clean(
      Boilerplate.syntheticPages(spark, 110), "text")
    val bad = cleaned.filter(col("n_kept") === 0 ||
      col("n_kept") === col("n_lines")).count()
    assert(bad === 0L, "fixture must exercise both classes on every page")
    // prose lines are exactly the (i + j) % 3 != 0 ones
    val r = cleaned.select(col("doc_id"), col("n_lines"), col("n_kept"))
      .collect()
    r.foreach { row =>
      val i = row.getLong(0); val L = 6 + (i % 7).toInt
      val expectKept = (0 until L).count(j => (i + j) % 3 != 0)
      assert(row.getLong(1) === L.toLong && row.getLong(2) === expectKept,
        s"page $i")
    }
  }
}
