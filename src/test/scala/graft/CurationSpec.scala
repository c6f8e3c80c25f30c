package graft

import org.apache.spark.sql.functions._

import graft.batch.CurationJob

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private val good = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon " +
    "phi chi psi omega one two three four five six seven eight nine"

  test("curate drops exact dups, near-dups, short and junk docs") {
    val docs = Seq(
      (1L, good),                              // keeper
      (2L, good),                              // exact dup of 1 → out
      (3L, good.replace("sigma", "SIGX")),     // near-dup of 1 → out
      (4L, "too short"),                       // < 10 tokens → out
      (5L, "!!! ??? !!! ??? !!! ??? !!! ??? !!! ??? !!! ???"), // junk
      (6L, good.split(" ").reverse.mkString(" ") + " extra tokens " +
        "appended here to make this clearly different from doc one"))
      .toDF("doc_id", "text")
    val out = CurationJob.curate(docs, minTokens = 10,
      minQuality = 0.05, nearDupThreshold = 0.5)
    val kept = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 6L), s"kept=$kept")
    val row = out.filter(col("doc_id") === 1).collect().head
    assert(row.getAs[Long]("n_tokens") == 33)
    assert(row.getAs[Double]("quality") > 0.05)
    assert(row.getAs[String]("lang_pred") != null)
  }

  test("language gate keeps only requested languages") {
    val docs = Seq(
      (1L, "the cat and the dog sat with the children in the garden " +
        "near the big house by the river"),
      (2L, "el perro y la gata de la casa que estaba en una calle " +
        "cerca de la plaza mayor de madrid"))
      .toDF("doc_id", "text")
    val out = CurationJob.curate(docs, minTokens = 5,
      minQuality = 0.0, keepLangs = Seq("en"), nearDupThreshold = 0.9)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }
}
