package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a quarantined evaluation set.
  *
  * Scale shape: the benchmark side of the join is an eval corpus —
  * megabytes, not terabytes — so its distinct n-gram hashes are
  * broadcast and the 100 TB corpus side never shuffles its text. The
  * corpus is scanned twice, both times as narrow codegen'd passes
  * ([[graft.functions.WordShingles]]): once exploded to probe the
  * broadcast set (only HITS survive into the aggregation, so the
  * post-join shuffle is proportional to contamination, not corpus
  * size), once to count each document's distinct n-grams. The final
  * totals-with-hits join is id-to-id with a tiny right side (AQE
  * picks a broadcast join).
  */
object Decontam {

  private def withNgramSet(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
      array_distinct(DedupOps.shingles(col(textCol), n)).as("__ngs"))

  /** Per corpus document: distinct n-gram count, how many of those
    * n-grams appear anywhere in `bench`, the contaminated fraction,
    * and a boolean flag. N-grams are compared by 64-bit hash — at any
    * realistic eval-set size collisions are vanishingly rare, and the
    * broadcast carries 8 bytes per n-gram instead of the string.
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val benchNg = withNgramSet(bench, idCol, textCol, n)
      .select(explode(col("__ngs")).as("__ng"))
      .select(xxhash64(col("__ng")).as("__h"))
      .distinct()
    val hits = withNgramSet(corpus, idCol, textCol, n)
      .select(col(idCol), explode(col("__ngs")).as("__ng"))
      .select(col(idCol), xxhash64(col("__ng")).as("__h"))
      .join(broadcast(benchNg), Seq("__h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_overlap"))
    val totals = withNgramSet(corpus, idCol, textCol, n)
      .select(col(idCol), size(col("__ngs")).cast("long").as("n_ngrams"))
    totals.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_ngrams"),
        coalesce(col("__n_overlap"), lit(0L)).as("n_overlap"),
        graft.functions.Rounding.dround(
          coalesce(col("__n_overlap"), lit(0L)).cast("double") /
            greatest(col("n_ngrams"), lit(1L)).cast("double"), 4)
          .as("contamination_ratio"),
        (coalesce(col("__n_overlap"), lit(0L)) > 0).as("contaminated"))
  }
}
