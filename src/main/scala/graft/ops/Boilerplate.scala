package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the jusText/trafilatura-family
  * heuristic (Pomikálek 2011) in its Spark-native form: classify each
  * LINE of a page by token count and stopword density, keep the prose,
  * drop navigation/chrome. Crawled corpora lose most of their noise at
  * this stage — headers, menus, cookie banners are short and nearly
  * stopword-free, while natural prose is long and function-word-heavy.
  *
  * The full jusText algorithm adds link density and neighbor-context
  * smoothing; the two core features carry most of the separation and
  * keep the operator a PURE COLUMN EXPRESSION — split, per-line
  * lambda over codegen'd builtins (`filter`/`transform`/
  * `array_contains` with a `typedLit` stopword array), join. No UDF,
  * no shuffle: a narrow map over the scan, corpus-parallel at any
  * scale, and the whole classification is replayable in the DuckDB
  * oracle over the same closed-form fixture pages.
  */
object Boilerplate {

  /** Function words for the density feature. A real deployment loads
    * a per-language list (see [[graft.operators.LangId]]); the fixed
    * list keeps the operator (and its oracle) self-contained. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  /** Per-line keep rule: at least `minTokens` whitespace tokens AND a
    * stopword share of at least `minStopRatio`. */
  private def keepLine(ln: Column, minTokens: Int,
      minStopRatio: Double): Column = {
    val toks = split(ln, " ")
    val stops = size(filter(toks,
      w => array_contains(typedLit(Stopwords), w)))
    size(toks) >= minTokens &&
      stops.cast("double") / size(toks).cast("double") >= minStopRatio
  }

  /** Adds `clean_text` (content lines re-joined with newlines),
    * `n_lines`, and `n_kept` to `df`. Lines are `\n`-separated; the
    * caller lowercases first if its stopword list assumes it. */
  def clean(df: DataFrame, textCol: String, minTokens: Int = 4,
      minStopRatio: Double = 0.2): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, ln => keepLine(ln, minTokens, minStopRatio))
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("clean_text", array_join(kept, "\n"))
  }

  /** Deterministic multi-line page fixture (the corpus documents are
    * single-line word salad): every third line of page i is
    * stopword-free nav chrome, the rest prose with a 0.6 stopword
    * share — all token choices closed-form in (i, j) so the DuckDB
    * oracle rebuilds the exact pages and the exact cleaned text. */
  def syntheticPages(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val lines = (0 until (6 + i % 7)).map { j =>
        if ((i + j) % 3 == 0)
          s"nav${(i + j) % 5} item${(i * 3 + j) % 4} link${j % 6}"
        else
          s"the w${(i * 7 + j * 3) % 13} and w${(i + j * 5) % 11} " +
            s"is on the w${(i * 2 + j) % 7} of w${(i * 11 + j * 13) % 17}"
      }
      (i.toLong, lines.mkString("\n"))
    }.toDF("doc_id", "text")
  }
}
