package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    rankTopK(scored, k)
  }

  /** Top-k per query over scored (query_id, neighbor_id, cos_sim) rows
    * via the bounded-heap [[graft.functions.TopKByScore]] aggregate.
    * The previous `row_number().over(Window.partitionBy(query_id))`
    * hash-shuffled and sorted EVERY scored row just to discard all but
    * k of them — at corpus scale the window shuffle is the whole query
    * cost. The aggregate partial-aggregates map-side: each task ships
    * one O(k) heap per query, so the exchange carries queries×k rows
    * regardless of corpus size. Ordering (score desc, id asc, NaN
    * first) matches the window formulation; a null cos_sim (null
    * vector upstream) is DROPPED rather than ranked nulls-last — a
    * missing embedding is not a neighbor. */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    graft.functions.TopKByScore.requireIntegralId(scored, "neighbor_id",
      "SimilarityOps top-k ranking")
    graft.functions.TopKByScore.explodeTopK(scored, Seq("query_id"),
        col("cos_sim"), col("neighbor_id").cast("long"), k,
        outId = "neighbor_id", outScore = "cos_sim")
      .select(col("query_id"), col("neighbor_id"),
        dround(col("cos_sim"), 4).as("cos_sim"), col("rn"))
  }

  /** h-bit random-hyperplane signature via the native
    * [[graft.functions.HyperplaneLsh]] expression — seeded, deterministic
    * across executors, hyperplane matrix cached per JVM (the builtin
    * formulation re-derived the matrix per row). */
  def hyperplaneSig(vec: Column, bits: Int, seed: Int = 42): Column =
    graft.functions.HyperplaneLsh.column(vec, bits, seed)

  /** (table, bucket) signature pairs for `tables` independent
    * hyperplane tables (seeds 42, 43, …) — the banding structure of
    * MinHash-LSH transplanted to hyperplane LSH: a pair is a candidate
    * if it collides in ANY table. Single-table LSH forces an impossible
    * trade at scale — few bits ⇒ O(N²/2^bits) within-bucket pairs,
    * many bits ⇒ recall collapse; b tables of h bits keep buckets small
    * AND recall high (1-(1-p^h)^b). */
  def lshTables(vec: Column, bits: Int, tables: Int): Column =
    posexplode(array((0 until tables).map(t =>
      hyperplaneSig(vec, bits, seed = 42 + t)): _*))

  /** ANN via banded LSH: candidates collide in any of `tables`
    * sign-tables, deduped, then verified by exact cosine and ranked.
    * Signatures are computed scan-side; the only shuffles are the
    * (table, bucket) candidate equi-join and the id-keyed vector
    * re-joins. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, bits: Int = 8,
      tables: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val cSig = c.select(col("neighbor_id"),
      lshTables(col("__cv"), bits, tables).as(Seq("tbl", "bucket")))
    val qSig = q.select(col("query_id"),
      lshTables(col("__qv"), bits, tables).as(Seq("tbl", "bucket")))
    val cand = cSig.join(qSig, Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
    val scored = cand.join(q, Seq("query_id")).join(c, Seq("neighbor_id"))
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
    rankTopK(scored, k)
  }

  /** Deterministic initial codebook: the first `cells` vectors by id —
    * a bounded TakeOrdered collected to the driver (model metadata,
    * like trained k-means centroids). It then ships INSIDE the
    * NearestCells expression, so cell assignment stays a narrow map. */
  def initCodebook(df: DataFrame, idCol: String, vecCol: String,
      cells: Int): Array[Array[Double]] =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .orderBy(col(idCol)).limit(cells).select(col("__v"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** IVF-style ANN: corpus partitioned into C coarse cells by nearest
    * centroid; queries probe their `nprobe` nearest cells only. The
    * scale shape: the centroid table is tiny and broadcast twice; the
    * corpus is scanned once to assign cells (one narrow shuffle on
    * cell id), and each query touches ~nprobe/C of the corpus.
    * `trainIters` > 0 runs that many Lloyd iterations
    * ([[kmeansTrain]]) so cells are balanced around the data's real
    * structure — the defense against one mega-cell dominating probe
    * cost at scale; 0 keeps the deterministic first-`cells`-by-id
    * sample (cheapest, fine for tests).
    */
  /** @param excludeSelf drop candidates whose id equals the query id —
    *                     correct when queries are drawn FROM the corpus
    *                     (the q40 shape); pass false for EXTERNAL
    *                     queries whose id space is independent of the
    *                     corpus, where an id collision is coincidence
    *                     and the colliding doc is a legitimate result.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, cells: Int = 16,
      nprobe: Int = 4, trainIters: Int = 0,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val codebook: Array[Array[Double]] =
      if (trainIters > 0) kmeansTrain(corpus, idCol, vecCol, cells, trainIters)
      else initCodebook(corpus, idCol, vecCol, cells)
    val assigned = assignCells(c, "__cv", codebook)
      .select(col("cell"), col("neighbor_id"), col("__cv"))
    // queries probe their nprobe nearest cells (same fused expression)
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val probes = q.withColumn("cell",
        explode(graft.functions.NearestCells.column(col("__qv"),
          codebook, nprobe)))
      .select(col("cell"), col("query_id"), col("__qv"))
    val joined = assigned.join(probes, Seq("cell"))
    val scored =
      (if (excludeSelf) joined.filter(col("neighbor_id") =!= col("query_id"))
       else joined)
        .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
    rankTopK(scored, k)
  }

  /** Nearest-codebook-cell assignment as a NARROW map (no join, no
    * window, no Exchange): the codebook rides inside the fused
    * [[graft.functions.NearestCells]] expression. This is the stage
    * that touches every corpus row, so it must not shuffle. */
  def assignCells(df: DataFrame, vecCol: String,
      codebook: Array[Array[Double]]): DataFrame =
    df.withColumn("cell", element_at(
      graft.functions.NearestCells.column(col(vecCol), codebook, 1), 1))

  /** Embedding-cosine near-duplicate pairs via banded hyperplane LSH:
    * candidates collide in any of `tables` sign-tables (union), then
    * exact-cosine verification. Only (table, bucket, id) rows shuffle
    * for candidate generation — vectors re-join by id afterward. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8, tables: Int = 8)
      : DataFrame = {
    val v = df.select(col(idCol), col(vecCol).cast("array<double>")
      .as("__v"))
    val sig = v.select(col(idCol),
      lshTables(col("__v"), bits, tables).as(Seq("tbl", "bucket")))
    val a = sig.select(col("tbl"), col("bucket"), col(idCol).as("id_a"))
    val b = sig.select(col("tbl"), col("bucket"), col(idCol).as("id_b"))
    val cand = a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(v.select(col(idCol).as("id_a"), col("__v").as("va")), "id_a")
      .join(v.select(col(idCol).as("id_b"), col("__v").as("vb")), "id_b")
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), dround(col("cos_sim"), 4)
        .as("cos_sim"))
  }

  /** SemDeDup-style semantic deduplication: partition the corpus into
    * coarse cells by nearest centroid (the same narrow-map assignment
    * as [[ivfTopK]]), then drop every document that has an
    * above-threshold cosine neighbor WITH A SMALLER ID within its cell
    * (the deterministic form of "keep one representative per ε-ball").
    *
    * Scale shape: assignment is a narrow map (codebook rides inside the
    * fused expression); the pair join is an equi-join ON CELL, so pair
    * blowup is bounded per cell, never corpus-wide — with `cells` sized
    * to N/targetCellSize the work is Σ|cell|², the SemDeDup contract.
    * Misses cross-cell near-dups by design (the published trade-off;
    * recall comes from raising `cells` probe overlap, or running the
    * banded-LSH [[embeddingNearDups]] which has no cell boundary).
    *
    * Returns one verdict row per document: its cell, whether it is
    * kept, and (for dropped docs) the smallest-id duplicate it loses
    * to (`dup_of`), with THAT pair's similarity (`dup_sim` — the
    * cosine of the (dup_of, id) pair, not the max over all
    * above-threshold neighbors).
    *
    * `maxCellSize` caps pair-join blowup: a cell larger than the cap
    * is split into ceil(n/cap) deterministic subcells by md5(id), and
    * pairs are only compared within a subcell. Even a pathological
    * cell (every embedding identical) then costs O(n·cap) pairs
    * instead of O(n²) — the documented trade is that near-dups split
    * across subcells of an oversized cell are missed. `trainIters`
    * balances cells first ([[kmeansTrain]]), making the cap a backstop
    * rather than the common path.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, cells: Int = 16, trainIters: Int = 0,
      maxCellSize: Int = Int.MaxValue): DataFrame = {
    val v = df.select(col(idCol), col(vecCol).cast("array<double>")
      .as("__v"))
    val codebook: Array[Array[Double]] =
      if (trainIters > 0) kmeansTrain(df, idCol, vecCol, cells, trainIters)
      else initCodebook(df, idCol, vecCol, cells)
    val asn0 = assignCells(v, "__v", codebook)
    // per-cell counts are `cells` rows — broadcast back; oversized
    // cells subdivide by a hash any SQL engine can replicate
    // (md5 hex prefix, cf. Sampling), so the oracle can mirror it
    val counts = asn0.groupBy(col("cell")).agg(count(lit(1)).as("__n"))
    val nSub = ceil(col("__n") / lit(maxCellSize.toDouble)).cast("long")
    val asn = asn0.join(broadcast(counts), Seq("cell"))
      .withColumn("subcell", when(col("__n") <= maxCellSize, lit(0L))
        .otherwise(
          conv(substring(md5(concat(lit("cellsplit:"),
            col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
            % nSub))
      .drop("__n")
    val a = asn.select(col("cell"), col("subcell"), col(idCol).as("id_a"),
      col("__v").as("__va"))
    val b = asn.select(col("cell"), col("subcell"), col(idCol).as("id_b"),
      col("__v").as("__vb"))
    val dropped = a.join(b, Seq("cell", "subcell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__cs", cosine(col("__va"), col("__vb")))
      .filter(col("__cs") >= threshold)
      .groupBy(col("id_b"))
      // struct-min: the smallest-id duplicate AND that pair's cosine
      .agg(min(struct(col("id_a"), col("__cs"))).as("__best"))
      .select(col("id_b"), col("__best.id_a").as("dup_of"),
        dround(col("__best.__cs"), 4).as("dup_sim"))
    asn.select(col(idCol), col("cell"))
      .join(dropped.withColumnRenamed("id_b", idCol), Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("dup_of").isNull.as("kept"),
        col("dup_of"), col("dup_sim"))
  }

  /** One k-means iteration's M-step over `codebook` (defaulting to the
    * deterministic first-`cells`-by-id init): assign every vector to
    * its nearest centroid (the same zero-shuffle narrow map as
    * [[ivfTopK]]/[[semDedup]]), then average per (cell, dimension) —
    * the iteration [[kmeansTrain]] loops to produce the codebook those
    * operators consume. Long-form output (cell, dim, n_members,
    * mean_val): the per-dim explode shuffles (cell, dim, x) triples
    * with map-side combine, never whole vectors, and the result is
    * cells×dims rows — driver-collectable codebook metadata at any
    * corpus size.
    */
  def kmeansStep(df: DataFrame, idCol: String, vecCol: String,
      cells: Int = 16,
      codebook: Option[Array[Array[Double]]] = None): DataFrame = {
    val v = df.select(col(idCol), col(vecCol).cast("array<double>")
      .as("__v"))
    val cb = codebook.getOrElse(initCodebook(df, idCol, vecCol, cells))
    assignCells(v, "__v", cb)
      .select(col("cell"), posexplode(col("__v")).as(Seq("dim", "__x")))
      .groupBy(col("cell"), col("dim"))
      .agg(count(lit(1)).as("n_members"),
        (dround(avg(col("__x")), 6) + lit(0)).as("mean_val"))
  }

  /** Lloyd's algorithm: `iters` assign+mean rounds from the
    * deterministic first-`cells`-by-id init. Each round is one
    * distributed [[kmeansStep]] job whose result — at most cells×dims
    * (cell, dim, mean) rows — is collected as the next codebook; a
    * cell that lost all members keeps its previous centroid. Means are
    * rounded to 6 dp each round (and -0.0 normalized), making the
    * trained codebook bit-reproducible across engines — the property
    * the DuckDB oracles rely on. Cost: `iters` corpus scans, zero
    * corpus shuffles beyond the (cell, dim) partial-agg exchange.
    */
  // ---- product quantization (Jégou, Douze & Schmid 2011) -------------

  /** Σ(x−y)² over two double arrays — the per-subspace L2² distance PQ
    * quantizes under (codegen'd zip_with/aggregate, no UDF). */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v)

  /** The codebook as an in-row array<array<double>> literal: distance
    * evaluation and argmin stay a NARROW map over the corpus. */
  private def cbLiteral(cb: Array[Array[Double]]): Column =
    array(cb.map(c => array(c.map(lit(_)): _*)): _*)

  /** Index of the nearest centroid by L2² (ties → smaller index, via
    * array_position's first match). 0-based. */
  private def argminCell(sv: Column, cb: Array[Array[Double]]): Column = {
    val dists = transform(cbLiteral(cb), c => sqDist(sv, c))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Product-quantization training: split each vector into `m`
    * contiguous subspaces and run `iters` Lloyd rounds of L2 k-means
    * independently per subspace — returns codebooks[m][cells][dim/m].
    *
    * One corpus pass per iteration covers ALL subspaces: each row
    * computes its m cell assignments in-row (codebooks ride in the
    * plan as literals), explodes to (subspace, cell, dim, x) and a
    * single map-side-combined aggregate produces every subspace's
    * means at once — m×cells×(dim/m) = `dim`×`cells` rows of model
    * metadata per round, driver-collectable at any corpus size. Means
    * round to 6 dp (-0.0 normalized) per round, so the trained
    * codebooks are bit-reproducible across engines (the DuckDB oracle
    * unrolls the same rounds). Init: subspace slices of the first
    * `cells` vectors by id; a cell that loses all members keeps its
    * previous centroid. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, cells: Int = 16, iters: Int = 1)
      : Array[Array[Array[Double]]] =
    // same train-once-reuse as kmeansTrain: m×cells×(dim/m) doubles
    graft.core.ModelCache.cached(df,
      s"pq:$idCol:$vecCol:$m:$cells:$iters") {
      pqTrainUncached(df, idCol, vecCol, m, cells, iters)
    }.map(_.map(_.clone()))

  private def pqTrainUncached(df: DataFrame, idCol: String,
      vecCol: String, m: Int, cells: Int, iters: Int)
      : Array[Array[Array[Double]]] = {
    val init = df.select(col(idCol),
        col(vecCol).cast("array<double>").as("__v"))
      .orderBy(col(idCol)).limit(cells).select(col("__v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(init.nonEmpty, "pqTrain: empty corpus")
    val dim = init.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    var cbs: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => init.map(_.slice(j * sub, (j + 1) * sub)))
    val v = df.select(col(vecCol).cast("array<double>").as("__v"))
    for (_ <- 0 until iters) {
      val withCells = v.select(col("__v") +: (0 until m).map(j =>
        argminCell(slice(col("__v"), j * sub + 1, sub), cbs(j))
          .as(s"__c$j")): _*)
      val means = withCells
        .select(posexplode(col("__v")).as(Seq("__pos", "__x")) +:
          (0 until m).map(j => col(s"__c$j")): _*)
        .select((col("__pos") / sub).cast("int").as("__j"),
          element_at(array((0 until m).map(j => col(s"__c$j")): _*),
            (col("__pos") / sub).cast("int") + 1).as("cell"),
          pmod(col("__pos"), lit(sub)).cast("int").as("dim"),
          col("__x"))
        .groupBy(col("__j"), col("cell"), col("dim"))
        .agg((dround(avg(col("__x")), 6) + lit(0)).as("mx"))
        .collect()
      val next = cbs.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      cbs = next
    }
    cbs
  }

  /** Encode the corpus under trained PQ codebooks: per vector, the m
    * nearest-centroid codes (one byte each in production — `dim/m`×
    * compression) plus the reconstruction MSE the quantization incurs.
    * A single narrow pass: codes and distances are in-row expressions,
    * no shuffle at all before the caller's ordering. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, cells: Int = 16, iters: Int = 1): DataFrame = {
    val cbs = pqTrain(df, idCol, vecCol, m, cells, iters)
    val sub = cbs.head.head.length
    val dim = m * sub
    val v = df.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
    val parts = (0 until m).map { j =>
      val sv = slice(col("__v"), j * sub + 1, sub)
      val dists = transform(cbLiteral(cbs(j)), c => sqDist(sv, c))
      ((array_position(dists, array_min(dists)) - 1).cast("int")
        .as(s"code_$j"), array_min(dists))
    }
    v.select(col(idCol) +: parts.map(_._1) :+
      (dround(parts.map(_._2).reduce(_ + _) / lit(dim.toDouble), 8)
        + lit(0)).as("recon_mse"): _*)
  }

  /** PQ asymmetric-distance top-k (ADC): corpus vectors participate
    * ONLY through their m PQ codes — the scoring join never touches a
    * raw corpus vector, which is the entire point of PQ at 100 TB (the
    * scanned state per candidate is m bytes, not dim floats). Each
    * (query, candidate) distance is Σ_j L2²(query-slice_j,
    * centroid(code_j)), evaluated in-row against codebook literals;
    * ranking is the bounded-heap top-k (distance asc, id asc), so the
    * exchange carries queries×k rows. Exact-vector re-ranking of the
    * ADC shortlist is the standard second stage and composes with
    * [[bruteForceTopK]] on the shortlist ids. */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, m: Int = 4,
      cells: Int = 16, iters: Int = 1): DataFrame = {
    val cbs = pqTrain(corpus, idCol, vecCol, m, cells, iters)
    val sub = cbs.head.head.length
    val enc = corpus.select(col(idCol).as("neighbor_id") +:
      (0 until m).map { j =>
        argminCell(slice(col(vecCol).cast("array<double>"),
          j * sub + 1, sub), cbs(j)).as(s"__code$j")
      }: _*)
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv")))
    val ad = (0 until m).map { j =>
      sqDist(slice(col("__qv"), j * sub + 1, sub),
        element_at(cbLiteral(cbs(j)), col(s"__code$j") + 1))
    }.reduce(_ + _)
    val scored = enc.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__negd2", -ad)
    graft.functions.TopKByScore.explodeTopK(scored, Seq("query_id"),
        col("__negd2"), col("neighbor_id").cast("long"), k,
        outId = "neighbor_id", outScore = "__negd2")
      .select(col("query_id"), col("neighbor_id"),
        (dround(-col("__negd2"), 8) + lit(0)).as("adc_d2"), col("rn"))
  }

  /** Full IVF-PQ search — the standard billion-scale ANN architecture
    * (Jégou 2011), assembled from the pieces above:
    *  1. coarse prune: queries probe their `nprobe` nearest trained
    *     cells, so each query touches ~nprobe/cells of the corpus;
    *  2. ADC shortlist: surviving candidates are scored from their m
    *     PQ codes only (m small ints per candidate in the join);
    *  3. exact re-rank: the top-`rerank` shortlist re-joins its raw
    *     vectors by id for true-cosine ordering — rerank×queries rows,
    *     independent of corpus size.
    * Corpus vectors are touched exactly twice (cell+code assignment,
    * both narrow maps) plus the id-keyed shortlist re-join. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, cells: Int = 16,
      nprobe: Int = 4, coarseIters: Int = 2, m: Int = 4,
      pqCells: Int = 16, pqIters: Int = 1, rerank: Int = 20)
      : DataFrame = {
    val coarse =
      if (coarseIters > 0) kmeansTrain(corpus, idCol, vecCol, cells,
        coarseIters)
      else initCodebook(corpus, idCol, vecCol, cells)
    val cbs = pqTrain(corpus, idCol, vecCol, m, pqCells, pqIters)
    val sub = cbs.head.head.length
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val encoded = assignCells(c, "__cv", coarse)
      .select(col("cell") +: col("neighbor_id") +: (0 until m).map(j =>
        argminCell(slice(col("__cv"), j * sub + 1, sub), cbs(j))
          .as(s"__code$j")): _*)
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val probes = q.withColumn("cell",
      explode(graft.functions.NearestCells.column(col("__qv"), coarse,
        nprobe)))
    val ad = (0 until m).map { j =>
      sqDist(slice(col("__qv"), j * sub + 1, sub),
        element_at(cbLiteral(cbs(j)), col(s"__code$j") + 1))
    }.reduce(_ + _)
    val scored = encoded.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__negd2", -ad)
    val short = graft.functions.TopKByScore.explodeTopK(scored,
      Seq("query_id"), col("__negd2"), col("neighbor_id").cast("long"),
      rerank, outId = "neighbor_id", outScore = "__negd2")
    val rr = short.select(col("query_id"), col("neighbor_id"))
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos_sim", cosine(col("__qv"), col("__cv")))
    rankTopK(rr, k)
  }

  def kmeansTrain(df: DataFrame, idCol: String, vecCol: String,
      cells: Int = 16, iters: Int = 2): Array[Array[Double]] =
    // train-once-reuse: several queries of one session train the
    // identical codebook (assign, SemDeDup, IVF probe, recall audit);
    // the cached artifact is 16×dim doubles of driver-held metadata.
    // Deep-copied per access — callers must not see shared mutable
    // arrays.
    graft.core.ModelCache.cached(df,
      s"kmeans:$idCol:$vecCol:$cells:$iters") {
      kmeansTrainUncached(df, idCol, vecCol, cells, iters)
    }.map(_.clone())

  private def kmeansTrainUncached(df: DataFrame, idCol: String,
      vecCol: String, cells: Int, iters: Int): Array[Array[Double]] = {
    var cb = initCodebook(df, idCol, vecCol, cells)
    var it = 0
    while (it < iters) {
      val next = cb.map(_.clone())
      kmeansStep(df, idCol, vecCol, cells, Some(cb)).collect()
        .foreach { r =>
          next(r.getAs[Int]("cell"))(r.getAs[Int]("dim")) =
            r.getAs[Double]("mean_val")
        }
      cb = next
      it += 1
    }
    cb
  }
}
