package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-nearest-neighbor label voting over the IVF ANN path — the
  * classification twin of [[SimilarityOps.ivfTopK]]: each unlabeled
  * vector probes its `nprobe` nearest coarse cells of the LABELED
  * corpus, takes the top-`k` cosine neighbors found there, and adopts
  * the majority label (ties → more votes first, then the smaller
  * label). Where [[CentroidClassifier]] assumes one tight centroid per
  * label, kNN handles multi-modal label regions — at the cost of
  * touching ~nprobe/cells of the labeled corpus per query instead of
  * labels×dim metadata.
  *
  * Shape at scale: the heavy stage IS ivfTopK (narrow-map cell
  * assignment, per-cell candidate join, bounded-heap top-k); voting
  * adds one queries×k label join and a queries-sized argmax via a
  * bounded `max(struct)` aggregate — no window over anything
  * corpus-sized.
  */
object KnnClassifier {

  /** @param train labeled vectors (`idCol`, `vecCol`, `labelCol`)
    * @param test  unlabeled vectors (`idCol`, `vecCol`)
    * @return (query_id, pred_label, votes) — one row per test vector
    *         that found ≥1 neighbor in its probed cells */
  def classify(train: DataFrame, test: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int = 5, cells: Int = 16,
      nprobe: Int = 4, trainIters: Int = 0): DataFrame = {
    // test vectors are an EXTERNAL query set: a test id colliding
    // with a train id is coincidence, and the colliding train vector
    // is a legitimate nearest neighbor — never self-excluded
    val nn = SimilarityOps.ivfTopK(train, test, idCol, vecCol,
      idCol, k = k, cells = cells, nprobe = nprobe,
      trainIters = trainIters, excludeSelf = false)
    val votes = nn
      .join(train.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("__lbl")), Seq("neighbor_id"))
      .groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("votes"))
    // argmax (votes desc, label asc) via a bounded struct-max: negate
    // the label so the natural struct ordering picks the smaller one
    votes
      .groupBy(col("query_id"))
      .agg(max(struct(col("votes"),
        negate(col("__lbl").cast("long")).as("__nl"))).as("__b"))
      .select(col("query_id"),
        negate(col("__b.__nl")).cast("int").as("pred_label"),
        col("__b.votes").as("votes"))
  }

  /** Distance-weighted voting (sklearn's `weights="distance"` shape,
    * on cosine): each of the k neighbors votes its SIMILARITY instead
    * of 1, so a single very-close neighbor can outvote two distant
    * ones — the standard remedy when k neighbors straddle a class
    * boundary. Per-neighbor cosines are scaled to integers (×10⁶)
    * before the per-label sum, so the vote totals are exact and
    * partition-order-free; argmax ties break toward the smaller
    * label. Output: (query_id, pred_label, vote_weight — the winning
    * label's summed similarity, 4 dp). Same shapes as [[classify]].
    */
  def classifyWeighted(train: DataFrame, test: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int = 5,
      cells: Int = 16, nprobe: Int = 4, trainIters: Int = 0)
      : DataFrame = {
    val nn = SimilarityOps.ivfTopK(train, test, idCol, vecCol,
      idCol, k = k, cells = cells, nprobe = nprobe,
      trainIters = trainIters, excludeSelf = false)
    val votes = nn
      .join(train.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("__lbl")), Seq("neighbor_id"))
      .withColumn("__w", round(col("cos_sim") * 1e6).cast("long"))
      .groupBy(col("query_id"), col("__lbl"))
      .agg(sum(col("__w")).as("__ws"))
    votes
      .groupBy(col("query_id"))
      .agg(max(struct(col("__ws"),
        negate(col("__lbl").cast("long")).as("__nl"))).as("__b"))
      .select(col("query_id"),
        negate(col("__b.__nl")).cast("int").as("pred_label"),
        (graft.functions.Rounding.dround(
          col("__b.__ws").cast("double") / 1e6, 4) + lit(0))
          .as("vote_weight"))
  }
}
