package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Rounding.dround

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exactness baseline. The query set is
  *    broadcast (it is small by construction); the corpus streams through
  *    a single scan, so the cost is one pass over the data and a
  *    TakeOrdered per query — no corpus shuffle at all.
  *  - LSH-bucketed (random-hyperplane signs → bucket id) — the scale
  *    path: corpus and queries are bucketed by an h-bit signature and
  *    joined bucket-to-bucket, turning the N×Q cross product into
  *    per-bucket joins. Recall is tunable via number of probe tables.
  *
  * All vector math is `zip_with`/`aggregate` built-ins (codegen'd).
  */
object SimilarityOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  /** Cosine via the native fused-loop [[graft.functions.CosineSim]]
    * expression (one vector walk instead of three zip_with/aggregate
    * passes with an intermediate array per pair). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.column(a, b)

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * (broadcast); corpus of any size. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).as("__qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim",
        cosine(col("__qv").cast("array<double>"),
          col("__cv").cast("array<double>")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        dround(col("cos_sim"), 4).as("cos_sim"), col("rn"))
  }

  /** h-bit random-hyperplane signature via the native
    * [[graft.functions.HyperplaneLsh]] expression — seeded, deterministic
    * across executors, hyperplane matrix cached per JVM (the builtin
    * formulation re-derived the matrix per row). */
  def hyperplaneSig(vec: Column, bits: Int, seed: Int = 42): Column =
    graft.functions.HyperplaneLsh.column(vec, bits, seed)

  /** ANN via LSH buckets: join corpus and queries on an h-bit signature,
    * rank within bucket. Trades recall for turning the cross join into a
    * bucket equi-join — the shape that scales. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, bits: Int = 8)
      : DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("bucket", hyperplaneSig(col("__cv"), bits))
    val q = queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("bucket", hyperplaneSig(col("__qv"), bits))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        dround(col("cos_sim"), 4).as("cos_sim"), col("rn"))
  }

  /** IVF-style ANN: corpus partitioned into C coarse cells by nearest
    * centroid; queries probe their `nprobe` nearest cells only. The
    * scale shape: the centroid table is tiny and broadcast twice; the
    * corpus is scanned once to assign cells (one narrow shuffle on
    * cell id), and each query touches ~nprobe/C of the corpus.
    * Centroids here are a deterministic sample (the first `cells`
    * vectors by id) — a production build would train k-means and pass
    * the centroid table in; the query path is identical.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, cells: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    // TakeOrdered of the first `cells` ids — NOT a global window, which
    // would sort the whole corpus in one task
    val centroids = broadcast(
      c.orderBy(col("neighbor_id")).limit(cells)
        .withColumn("cell", monotonically_increasing_id())
        .select(col("cell"), col("__cv").as("__cent")))
    // assign every corpus vector to its nearest centroid cell
    val assigned = c.crossJoin(centroids)
      .withColumn("__sim", cosine(col("__cv"), col("__cent")))
      .withColumn("__r", row_number().over(Window
        .partitionBy(col("neighbor_id"))
        .orderBy(col("__sim").desc, col("cell"))))
      .filter(col("__r") === 1)
      .select(col("cell"), col("neighbor_id"), col("__cv"))
    // queries probe their nprobe nearest cells
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val probes = q.crossJoin(centroids)
      .withColumn("__sim", cosine(col("__qv"), col("__cent")))
      .withColumn("__r", row_number().over(Window
        .partitionBy(col("query_id"))
        .orderBy(col("__sim").desc, col("cell"))))
      .filter(col("__r") <= nprobe)
      .select(col("cell"), col("query_id"), col("__qv"))
    val scored = assigned.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        dround(col("cos_sim"), 4).as("cos_sim"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8): DataFrame = {
    val v = df.select(col(idCol), col(vecCol).cast("array<double>")
        .as("__v"))
      .withColumn("bucket", hyperplaneSig(col("__v"), bits))
    val a = v.select(col("bucket"), col(idCol).as("id_a"),
      col("__v").as("va"))
    val b = v.select(col("bucket"), col(idCol).as("id_b"),
      col("__v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), dround(col("cos_sim"), 4)
        .as("cos_sim"))
      .distinct()
  }
}
