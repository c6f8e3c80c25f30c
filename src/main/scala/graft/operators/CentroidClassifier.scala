package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround

/** Nearest-centroid (Rocchio) classification over an embedding column
  * — the cheap, trainable-in-one-pass labeler a curation pipeline uses
  * for topic/domain routing when a seed set carries labels (the same
  * job FastText-style classifiers do in published web-corpus
  * pipelines, expressed on vectors the pipeline already has).
  *
  * Train: per-label mean vector over the labeled slice — one
  * map-side-combined aggregation producing labels×dim rows of model
  * metadata (never corpus-sized). Means round to 6 dp (-0.0
  * normalized), the same bit-reproducibility discipline as the k-means
  * codebooks, so the DuckDB oracle re-derives identical centroids.
  *
  * Classify: centroids collect to the driver (bounded model metadata)
  * and ride into the plan as an array literal; per-row cosine argmax
  * is a NARROW map over the corpus — zero shuffles, any corpus size.
  * Ties break toward the smaller label (array_position's first match
  * over the ascending-label centroid array).
  */
object CentroidClassifier {

  /** Per-label mean centroids: (label, dim, n_members, mean_val). */
  def trainCentroids(train: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    train.select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>"))
          .as(Seq("dim", "__x")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_members"),
        (dround(avg(col("__x")), 6) + lit(0)).as("mean_val"))

  /** Collected (label asc) → (labels, centroid matrix) — bounded
    * driver metadata, like a trained codebook. */
  private def collectCentroids(centroids: DataFrame)
      : (Array[Int], Array[Array[Double]]) = {
    val rows = centroids
      .groupBy(col("label").cast("int").as("label"))
      .agg(map_from_entries(collect_list(
        struct(col("dim").cast("int"), col("mean_val")))).as("__m"))
      .collect()
      .map { r =>
        val m = r.getMap[Int, Double](1)
        // dims must be contiguous 0..n-1 — a gap means the training
        // vectors were ragged (different lengths per label)
        require((0 until m.size).forall(m.contains),
          s"label ${r.getInt(0)}: ragged training vectors " +
            s"(dims ${m.keys.toSeq.sorted.mkString(",")})")
        (r.getInt(0), Array.tabulate(m.size)(m(_)))
      }
      .sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  /** Predict the label whose centroid has the highest cosine with each
    * row's vector. Output: (`idCol`, pred_label, pred_cos). */
  def classify(test: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val (labels, cbs) = collectCentroids(centroids)
    require(labels.nonEmpty, "classify: no trained centroids")
    val cbLit: Column =
      array(cbs.map(cv => array(cv.map(lit(_)): _*)): _*)
    val v = col(vecCol).cast("array<double>")
    val sims = transform(cbLit,
      cv => graft.functions.CosineSim.column(v, cv))
    val labLit = array(labels.map(lit(_)): _*)
    // argmax with ties → first (= smallest) label
    val best = (array_position(sims, array_max(sims)) - 1).cast("int")
    test.select(col(idCol),
      element_at(labLit, best + 1).as("pred_label"),
      (dround(element_at(sims, best + 1), 4) + lit(0)).as("pred_cos"))
  }
}
