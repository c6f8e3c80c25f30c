package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Rounding.dround
import graft.functions.TextFunctions
import graft.operators.{DedupOps, SimilarityOps}
import graft.ops.{ConditionalCounts, DataQuality, DedupLatest, TopNPerGroup}

/** The operator catalog: one named query per SURVEY.md §2 operator (plus
  * the training-data-pipeline operators), each expressed on the driver's
  * star schema with a DuckDB oracle in [[Oracles]].
  *
  * Conventions that keep the oracle hash-compare stable:
  *  - every aggregate / computed column is aliased identically here and in
  *    the SQL;
  *  - doubles are rounded (2 decimals for large sums, 4 elsewhere);
  *  - integral aggregates are BIGINT on both sides;
  *  - every result has a deterministic total order.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // (measured dead end, round 14: hash-repartitioning the documents
  // scan right after the read — guide §2.5's unsplittable-input remedy
  // for the driver's single-row-group parquet files — REGRESSED every
  // pilot query (q110 1.75→2.52 s, q122 1.46→2.08, q71 1.85→2.35,
  // q26 0.34→0.49; only q107 flat): with the 64k AQE coalescing floor
  // the heavy per-row work is already parallel after each pipeline's
  // first NATURAL exchange, so the extra shuffle of raw text plus the
  // lost scan-stage fusion outweigh the single-task scan it replaces.
  // Revisit only if a future testdata layout ships row groups larger
  // than one core can chew AND a pipeline has no early exchange.)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregation (SURVEY §2.5) ------------------------------------
    "q01_global_agg" -> ((s, d) => {
      // A1: global aggregate, no grouping (ref: 02_ingest_smartpool.py:74)
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        dround(sum(col("l_quantity")), 2).as("sum_qty"),
        dround(max(col("l_extendedprice")), 4).as("max_price"),
        dround(min(col("l_discount")), 4).as("min_disc"),
        dround(avg(col("l_tax")), 4).as("avg_tax"))
    }),

    "q02_groupby_stats" -> ((s, d) => {
      // A2/A4: multi-key hash agg w/ count/avg/min/max/sum
      // (ref: 06_gold_electricity_enrichment.py:31-40)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          dround(sum(col("l_quantity")), 2).as("sum_qty"),
          dround(avg(col("l_extendedprice")), 4).as("avg_price"),
          dround(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          dround(min(col("l_discount")), 4).as("min_disc"),
          dround(max(col("l_tax")), 4).as("max_tax"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q03_conditional_agg" -> ((s, d) => {
      // A3: pivot-like sum(when) counts (ref: 04_gold_smartpool.ipynb §3)
      ConditionalCounts(t(s, d, "orders"), Seq("o_orderstatus"),
        "o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        extraAggs = Seq(count(lit(1)).as("n")))
        .withColumnsRenamed(Map(
          "n_1-URGENT" -> "n_urgent", "n_2-HIGH" -> "n_high",
          "n_3-MEDIUM" -> "n_medium", "n_4-NOT SPECIFIED" -> "n_notspec",
          "n_5-LOW" -> "n_low"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- joins (SURVEY §2.4) ------------------------------------------
    "q04_join_left" -> ((s, d) => {
      // J1/J2: left equi join, row level (ref: 04_gold_smartpool.py:22-28)
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(o("o_orderkey"), o("o_totalprice"), c("c_name"),
          c("c_mktsegment"))
        .orderBy(col("o_orderkey"))
    }),

    "q05_join_multikey" -> ((s, d) => {
      // J3: multi-key equi join of two aggregates
      // (ref: 06_gold_electricity_enrichment.ipynb §4)
      val li = t(s, d, "lineitem")
      val rev = li.groupBy(to_date(col("l_shipdate")).as("ship_date"),
          col("l_returnflag"))
        .agg(dround(sum(col("l_extendedprice")), 2).as("revenue"))
      val qty = li.groupBy(to_date(col("l_shipdate")).as("ship_date"),
          col("l_returnflag"))
        .agg(dround(sum(col("l_quantity")), 2).as("qty"))
      rev.join(qty, Seq("ship_date", "l_returnflag"), "left")
        .orderBy(col("ship_date"), col("l_returnflag"))
    }),

    "q06_join_inner" -> ((s, d) => {
      // J4: inner join as referential-integrity filter
      // (ref: 03_silver_smartpool.ipynb §4)
      val li = t(s, d, "lineitem")
      val p = t(s, d, "part")
      li.join(p, li("l_partkey") === p("p_partkey"), "inner")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          dround(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("p_brand"))
    }),

    "q07_join_anti" -> ((s, d) => {
      // J5: left-anti orphan check (ref: 03_silver_smartpool.ipynb §6);
      // anti against the P-status subset so the result is non-trivial
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q08_join_semi" -> ((s, d) => {
      // J4-as-semi: EXISTS via left_semi (cleaner form of the reference's
      // inner-join RI filter, SURVEY §2.4 J4 note)
      t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // ---- windows (SURVEY §2.6) ----------------------------------------
    "q09_dedup_latest" -> ((s, d) => {
      // W1: latest-wins dedup w/ tie-breaker
      // (ref: 03_silver_smartpool.py:14-20)
      DedupLatest(t(s, d, "events"), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts"))
        .orderBy(col("user_id"))
    }),

    "q10_topn_group" -> ((s, d) => {
      // W2: top-N per group via row_number
      // (ref: 06_gold_electricity_enrichment.ipynb §3)
      TopNPerGroup.rowNumber(
        t(s, d, "events").select(col("event_type"), col("event_id"),
          col("value")),
        Seq("event_type"), Seq(col("value").desc, col("event_id")), 3)
        .orderBy(col("event_type"), col("rn"))
    }),

    "q11_dense_rank" -> ((s, d) => {
      // W3: top-N with ties via dense_rank
      // (ref: 06_gold_electricity_enrichment.py:51-54)
      TopNPerGroup.denseRank(
        t(s, d, "part").select(col("p_brand"), col("p_partkey"),
          col("p_retailprice")),
        Seq("p_brand"), Seq(col("p_retailprice").desc), 3)
        .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
    }),

    // ---- sort / limit / set ops (SURVEY §2.7) -------------------------
    "q12_toplimit" -> ((s, d) => {
      // O2: orderBy+limit → TakeOrderedAndProject
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q13_distinct_union" -> ((s, d) => {
      // O4/O5: union + distinct (ref: spark_job.py:51;
      // 03_silver_smartpool.ipynb §6)
      t(s, d, "customer").select(col("c_mktsegment").as("v")).distinct()
        .union(t(s, d, "orders").select(col("o_orderstatus").as("v"))
          .distinct())
        .distinct()
        .orderBy(col("v"))
    }),

    // ---- filters / projection (SURVEY §2.3) ---------------------------
    "q14_filters" -> ((s, d) => {
      // P5/P6/P7: isin + between + isNotNull + coalesce
      // (ref: 03_silver_smartpool.ipynb §4; 07_kafka….ipynb §5)
      t(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_quantity").between(10, 30) &&
          col("l_shipdate").isNotNull &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .withColumn("disc", coalesce(col("l_discount"), lit(0.0)))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dround(sum(col("disc")), 4)
          .as("sum_disc"))
        .orderBy(col("l_returnflag"))
    }),

    "q15_case_map" -> ((s, d) => {
      // CASE chain + map-literal cost model
      // (ref: 04_gold_smartpool.py:41-46; 06_gold….ipynb §5)
      val factor = typedlit(Map(
        "1-URGENT" -> 1.5, "2-HIGH" -> 1.2, "3-MEDIUM" -> 1.0))
      t(s, d, "orders")
        .withColumn("priority_factor",
          coalesce(element_at(factor, col("o_orderpriority")), lit(0.8)))
        .withColumn("weighted_price",
          dround(col("o_totalprice") * col("priority_factor"), 4))
        .select(col("o_orderkey"), col("priority_factor"),
          col("weighted_price"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- datetime functions (SURVEY §2.8) -----------------------------
    "q16_datetime" -> ((s, d) => {
      // to_date / hour / group (ref: 06_gold_electricity_enrichment.py:29)
      t(s, d, "events")
        .groupBy(to_date(col("ts")).as("event_date"),
          hour(col("ts")).as("event_hour"))
        .agg(count(lit(1)).as("n"), dround(sum(col("value")), 2)
          .as("sum_value"))
        .orderBy(col("event_date"), col("event_hour"))
    }),

    "q17_window_tumbling" -> ((s, d) => {
      // A6 batch form: 1-minute tumbling window agg
      // (ref: 07_kafka_smartpool_sensors.py:103-132)
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n_readings"),
          dround(avg(col("value")), 4).as("avg_value"),
          dround(max(col("value")), 4).as("max_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n_readings"), col("avg_value"), col("max_value"))
        .orderBy(col("w_start"), col("event_type"))
    }),

    "q18_json_extract" -> ((s, d) => {
      // from_json + getField (ref: 07_kafka_smartpool_sensors.py:87-88)
      t(s, d, "events")
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .groupBy(col("event_type"))
        .agg(sum(col("j.k").cast("long")).as("sum_k"),
          count(lit(1)).as("n_k"))
        .orderBy(col("event_type"))
    }),

    "q19_dq_duplicates" -> ((s, d) => {
      // A5: duplicate detection agg (ref: 03_silver_smartpool.ipynb §6)
      DataQuality.duplicateKeys(
        t(s, d, "events").withColumn("event_date", to_date(col("ts"))),
        Seq("user_id", "event_date"))
        .orderBy(col("user_id"), col("event_date"))
    }),

    // ---- text analysis (training-data pipeline) -----------------------
    "q20_text_stats" -> ((s, d) => {
      val doc = t(s, d, "documents")
      doc.select(
        col("doc_id"),
        TextFunctions.charCount(col("text")).cast("long").as("n_chars_m"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.bpeishCount(col("text")).cast("long").as("n_units"),
        dround(TextFunctions.punctRatio(col("text")), 4).as("punct_ratio"))
        .orderBy(col("doc_id"))
    }),

    "q21_quality_score" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "q22_langid" -> ((s, d) => {
      // language-ID heuristic scored against the labeled lang column
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    "q23_exact_dedup" -> ((s, d) => {
      DedupOps.exactDedup(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q24_minhash_neardups" -> ((s, d) => {
      DedupOps.minhashNearDups(t(s, d, "documents"), "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q25_simhash_neardups" -> ((s, d) => {
      DedupOps.simhashNearDups(t(s, d, "documents"), "doc_id", "text",
        maxHamming = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q26_ngram_jaccard" -> ((s, d) => {
      // exact 3-gram Jaccard over a bounded candidate set (the docs are
      // near-orthogonal word salad, so the report threshold is low)
      // pre-distinct the shingle sets once per doc (not once per pair)
      // and broadcast one side: a plain crossJoin plans a
      // CartesianProduct whose every task re-reads and re-shingles both
      // input partitions — 7.9 s at sf0.1 vs <1 s broadcast
      val doc = t(s, d, "documents").filter(col("doc_id") < 100)
        .withColumn("sh", array_distinct(DedupOps.shingles(col("text"), 3)))
      val a = doc.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = doc.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
      a.crossJoin(broadcast(b)).filter(col("id_a") < col("id_b"))
        .withColumn("jaccard",
          dround(DedupOps.jaccardDistinct(col("sh_a"), col("sh_b")), 4))
        .filter(col("jaccard") >= 0.01)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q27_fingerprint" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // ---- similarity search (training-data pipeline) -------------------
    "q28_ann_bruteforce" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      SimilarityOps.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        "vec_id", k = 5)
        .orderBy(col("query_id"), col("rn"))
    }),

    "q29_embedding_norms" -> ((s, d) => {
      t(s, d, "embeddings")
        .select(col("vec_id"),
          dround(SimilarityOps.l2Norm(col("embedding")
            .cast("array<double>")), 4).as("l2_norm"),
          col("label"))
        .orderBy(col("vec_id"))
    }),

    // ---- upsert / merge semantics as a query (K4, SURVEY §2.2) -------
    "q31_upsert" -> ((s, d) => {
      // merge: per-customer latest order value upserts a target balance
      // table — updates for existing keys, inserts for new ones
      // (ref: 03_silver_smartpool.ipynb §4 MERGE; non-Delta fallback)
      val target = t(s, d, "customer")
        .filter(col("c_custkey") <= 100)
        .select(col("c_custkey"), dround(col("c_acctbal"), 2).as("bal"))
      val source = t(s, d, "orders")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(dround(max(col("o_totalprice")), 2).as("bal"))
      graft.ops.Upsert(target, source, Seq("c_custkey"),
        Seq(col("bal").desc))
        .orderBy(col("c_custkey"))
    }),

    "q32_multiformat_ts" -> ((s, d) => {
      // multi-format timestamp parse chain (ref: 07_kafka….ipynb §5):
      // format each event ts three different ways, parse back, output
      // must round-trip to the original value
      val e = t(s, d, "events")
      val asStr = e.withColumn("ts_str",
        when(col("event_id") % 3 === 0,
          concat(date_format(col("ts"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("Z")))
          .when(col("event_id") % 3 === 1,
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
          .otherwise(concat(date_format(col("ts"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), lit("+00:00"))))
      asStr.select(col("event_id"),
        graft.functions.TimeParse.parseTimestamp(col("ts_str"))
          .as("parsed_ts"))
        .orderBy(col("event_id"))
    }),

    "q33_approx_distinct" -> ((s, d) => {
      // approx_count_distinct (HLL) vs exact, as a tolerance flag —
      // the sketch is impl-specific, so the envelope must hold for any
      // reasonable implementation: rsd 0.01 here (≤ ~2% typical error)
      // against a 10% bound (default rsd 0.05 breached 5% at sf0.1)
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.01).as("approx"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("approx") - col("n_exact")).cast("double") /
            col("n_exact") < 0.10).as("approx_ok"))
        .orderBy(col("event_type"))
    }),

    "q34_rollup" -> ((s, d) => {
      // rollup with subtotal rows (engine-completeness beyond the
      // reference's flat groupBy)
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          dround(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q35_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dround(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    "q36_session_window" -> ((s, d) => {
      // session windows (gap-based) — streaming-engine completeness
      // beyond the reference's tumbling windows; oracle is a
      // gaps-and-islands SQL formulation
      t(s, d, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n_events"),
          dround(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "q37_sliding_window" -> ((s, d) => {
      // sliding windows: 10-minute windows every 5 minutes — each event
      // lands in exactly two windows
      t(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"),
          dround(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"),
          col("sum_value"))
        .orderBy(col("w_start"))
    }),

    "q38_salted_join" -> ((s, d) => {
      // salted skew join must be result-identical to the plain join
      val events = t(s, d, "events")
      val dim = t(s, d, "events").select(col("user_id")).distinct()
        .withColumn("user_tag",
          concat(lit("u"), col("user_id").cast("string")))
      graft.ops.SaltedJoin(events, dim, Seq("user_id"), salt = 8)
        .groupBy(col("user_id"), col("user_tag"))
        .agg(count(lit(1)).as("n"),
          dround(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("user_id"))
    }),

    "q39_multimodal_features" -> ((s, d) => {
      // multimodal surface: REAL header sniffing (PNG/WAV/JPEG dims
      // and sample rate parsed from the bytes) + the distributed
      // decode feature path — now FULLY hash-checked: every emitted
      // value is a closed-form function of the asset generator
      // (decode flags, header geometry, red-channel / PCM means,
      // noise byte statistics), recomputed by the oracle from the
      // pixel/sample formulas while the engine decodes actual
      // container bytes. The only masked values are the two that are
      // compressor outputs rather than content functions: n_bytes of
      // DEFLATE/JPEG streams (encoder-sized) and the JPEG channel
      // mean (lossy decode — held to javax.imageio by
      // JpegDecodeSpec). That the JPEG DID decode stays certified:
      // decoded_flag = 1 requires a successful real baseline decode
      val mm = graft.multimodal.MultimodalOps
      val assets = mm.syntheticMixedAssets(s, 300)
      val meta = mm.annotateAssets(assets).select(col("asset_id"),
        col("sniffed_format"), col("sniffed_width"),
        col("sniffed_sample_rate"))
      mm.extractFeatures(assets, dim = 16, partitions = 8)
        .join(meta, Seq("asset_id"))
        .select(col("asset_id"), col("modality"),
          when(col("sniffed_format").isin("png", "jpeg"), lit(null))
            .otherwise(col("n_bytes")).as("n_bytes"),
          element_at(col("feature"), 1).cast("bigint")
            .as("decoded_flag"),
          when(col("sniffed_format") === "jpeg", lit(null))
            .otherwise(dround(
              element_at(col("feature"), 5).cast("double"), 4)
              + lit(0)).as("mean_ch1"),
          col("sniffed_format"), col("sniffed_width"),
          col("sniffed_sample_rate"))
        .orderBy(col("asset_id"))
    }),

    "q41_string_funcs" -> ((s, d) => {
      // §2.8 string surface: concat_ws, lpad, regexp_replace,
      // date_format (ref: 05_ingest_electricity_csv.py:41,61;
      // 07_kafka….ipynb §5)
      t(s, d, "events")
        .select(col("event_id"),
          concat_ws("-", col("event_type"),
            lpad(col("user_id").cast("string"), 4, "0")).as("tag"),
          regexp_replace(col("props"), "[0-9]+", "N").as("props_norm"),
          date_format(col("ts"), "yyyy-MM-dd HH").as("hour_str"))
        .orderBy(col("event_id"))
    }),

    "q42_percentiles" -> ((s, d) => {
      // exact interpolated percentiles (median/p90) per group —
      // percentile() here, quantile_cont in the oracle
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          dround(expr("percentile(l_extendedprice, 0.5)"), 4)
            .as("p50_price"),
          dround(expr("percentile(l_extendedprice, 0.9)"), 4)
            .as("p90_price"),
          dround(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "q43_stats" -> ((s, d) => {
      // statistical aggregates: stddev/variance/correlation/covariance
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          dround(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          dround(var_samp(col("l_quantity")), 4).as("var_qty"),
          dround(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("corr_qty_price"),
          dround(covar_samp(col("l_discount"), col("l_tax")), 6)
            .as("cov_disc_tax"))
        .orderBy(col("l_linestatus"))
    }),

    "q44_curation" -> ((s, d) => {
      // end-to-end curation pipeline (annotate → exact dedup →
      // near-dup drop → quality gates). The corpus contains planted
      // near-duplicates (24 pairs with jaccard ≥ 0.95 at sf0.01); the
      // oracle replicates the near-dup stage with exact shingle
      // jaccard in SQL — LSH recall at j ≥ 0.95 with 16×4 bands is
      // 1 - 4e-12, so the sets agree
      graft.batch.CurationJob.curate(
        t(s, d, "documents").select(col("doc_id"), col("text")),
        minTokens = 10, minQuality = 0.05,
        nearDupThreshold = 0.95)
        .select(col("doc_id"), col("n_tokens"), col("n_units"),
          col("quality"))
        .orderBy(col("doc_id"))
    }),

    "q45_pivot" -> ((s, d) => {
      // relational pivot via the DataFrame pivot API (the reference
      // hand-rolls this with sum(when) — A3; this is the operator form)
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
            "5-LOW"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map(
          "1-URGENT" -> "n_urgent", "2-HIGH" -> "n_high",
          "3-MEDIUM" -> "n_medium", "4-NOT SPECIFIED" -> "n_notspec",
          "5-LOW" -> "n_low"))
        .na.fill(0L)
        .orderBy(col("o_orderstatus"))
    }),

    "q46_token_freq" -> ((s, d) => {
      // generator/explode surface: corpus token frequencies, top 50
      t(s, d, "documents")
        .select(explode(TextFunctions.tokens(lower(col("text"))))
          .as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    }),

    "q47_collect_set" -> ((s, d) => {
      // array aggregation: sorted distinct set per group, serialized to a
      // scalar (the driver's comparator can't hash array cells)
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(array_join(sort_array(collect_set(col("source"))), ",")
            .as("sources"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),

    "q48_setops" -> ((s, d) => {
      // except/intersect (absent from the reference; engine
      // completeness per SURVEY §2.7 note)
      val withOrders = t(s, d, "orders")
        .select(col("o_custkey").as("c_custkey")).distinct()
      val allCust = t(s, d, "customer").select(col("c_custkey"))
      val noOrders = allCust.except(withOrders)
        .withColumn("kind", lit("no_orders"))
      val both = allCust.intersect(withOrders)
        .withColumn("kind", lit("has_orders"))
      noOrders.union(both).orderBy(col("kind"), col("c_custkey"))
    }),

    "q40_ann_ivf" -> ((s, d) => {
      // IVF-style cell-probed ANN over a TRAINED codebook (2 Lloyd
      // iterations); oracle replicates the deterministic init, both
      // assign+mean rounds, argmax assignment, nprobe probes, and
      // (cos desc, id) ranking exactly in SQL (q28 is the exhaustive
      // baseline)
      val emb = t(s, d, "embeddings")
      graft.operators.SimilarityOps.ivfTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        "vec_id", k = 5, cells = 16, nprobe = 4, trainIters = 2)
        .orderBy(col("query_id"), col("rn"))
    }),

    "q30_embedding_neardups" -> ((s, d) => {
      // synthetic embeddings are near-orthogonal (max pair cos ≈ 0.4),
      // so the "near-dup" threshold is set low to exercise the
      // operator; banded LSH (8 tables × 8 bits) keeps buckets small
      // at scale while real near-parallel pairs are recovered with
      // probability 1-(1-p^8)^8 ≈ 99% at cos ≥ 0.95
      SimilarityOps.embeddingNearDups(t(s, d, "embeddings"), "vec_id",
        "embedding", threshold = 0.2, bits = 8, tables = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- temporal joins (beyond the reference; SURVEY §2.4 note) ------
    "q49_asof_join" -> ((s, d) => {
      // event attribution: each click gets the most recent preceding
      // purchase by the same user (inclusive, no tolerance). The right
      // side is deduped to one purchase per (user, ts) so the as-of
      // choice is deterministic on both sides.
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = DedupLatest(
        e.filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), Seq(col("event_id").desc))
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"),
          dround(col("value"), 4).as("purchase_value"))
      graft.ops.AsofJoin.backward(clicks, purchases,
        Seq("user_id"), Seq("user_id"), "ts", "ts",
        payload = Seq("purchase_id", "purchase_value"),
        matchedTimeAs = Some("purchase_ts"))
        .orderBy(col("event_id"))
    }),

    "q79_asof_forward" -> ((s, d) => {
      // forward attribution: each click gets the EARLIEST following
      // purchase by the same user (time-to-next-purchase); mirror of
      // q49's backward as-of
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = DedupLatest(
        e.filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), Seq(col("event_id").desc))
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"),
          dround(col("value"), 4).as("purchase_value"))
      graft.ops.AsofJoin.forward(clicks, purchases,
        Seq("user_id"), Seq("user_id"), "ts", "ts",
        payload = Seq("purchase_id", "purchase_value"),
        matchedTimeAs = Some("purchase_ts"))
        .orderBy(col("event_id"))
    }),

    "q50_range_join" -> ((s, d) => {
      // point-in-interval join via bucketed equi-join (no nested loop):
      // lineitem shipments falling in each order's 30-day window
      val ranges = t(s, d, "orders").filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"), col("o_orderdate").as("lo"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("hi"))
      val points = t(s, d, "lineitem")
        .select(col("l_shipdate"), col("l_quantity"))
      graft.ops.RangeJoin.pointInInterval(
        points, "l_shipdate", ranges, "lo", "hi",
        bucketWidthSeconds = 30L * 86400)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_ship"),
          dround(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- deterministic sampling (training-data curation) --------------
    "q51_det_sample" -> ((s, d) => {
      // stratified hash sample: different keep-rates per order status —
      // reproducible across engines/partitionings (md5-keyed, no RNG)
      graft.ops.DeterministicSample.stratifiedByHash(
        t(s, d, "orders"), col("o_orderkey"), col("o_orderstatus"),
        Map("O" -> 32, "F" -> 16, "P" -> 128))
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    "q58_group_sample" -> ((s, d) => {
      // deterministic k-per-group sample (reservoir without the RNG):
      // 5 smallest-md5 events per event_type
      graft.ops.DeterministicSample.perGroupTopK(
        t(s, d, "events"), Seq("event_type"), col("event_id"), k = 5)
        .select(col("event_type"), col("event_id"), col("rn"))
        .orderBy(col("event_type"), col("rn"))
    }),

    // ---- text analysis extensions -------------------------------------
    "q52_tfidf" -> ((s, d) => {
      // top-3 characteristic terms per document by smoothed TF-IDF
      graft.operators.TfIdf.topTerms(
        t(s, d, "documents"), "doc_id", "text", k = 3)
        .select(col("doc_id"), col("token"), col("tf"), col("tfidf"),
          col("rn"))
        .orderBy(col("doc_id"), col("rn"))
    }),

    "q53_text_scrub" -> ((s, d) => {
      // URL/email scrubbing + whitespace normalization; the corpus is
      // clean, so deterministic noise is injected first to make the
      // scrub observable, then removed again
      val noisy = t(s, d, "documents").withColumn("noisy",
        concat(col("text"), lit(" see https://ex.com/d/"),
          col("doc_id").cast("string"), lit(" or  mail user"),
          col("doc_id").cast("string"), lit("@ex.com .")))
      noisy.select(col("doc_id"),
        TextFunctions.tokenCount(col("noisy")).cast("long")
          .as("n_tokens_noisy"),
        length(TextFunctions.normalizeWhitespace(
          TextFunctions.scrubEmails(TextFunctions.scrubUrls(
            col("noisy"))))).cast("long").as("len_clean"),
        regexp_count(col("noisy"), lit(TextFunctions.UrlPattern))
          .cast("long").as("n_urls"),
        regexp_count(col("noisy"), lit(TextFunctions.EmailPattern))
          .cast("long").as("n_emails"))
        .orderBy(col("doc_id"))
    }),

    // ---- analytic window functions (beyond the reference, §2.6 note) --
    "q55_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events").select(col("user_id"), col("event_id"),
        dround(col("value"), 4).as("value"),
        dround(lag(col("value"), 1).over(w), 4).as("prev_value"),
        dround(lead(col("value"), 1).over(w), 4).as("next_value"),
        ntile(4).over(w).as("quartile"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q57_window_frames" -> ((s, d) => {
      // explicit rowsBetween frames: running sum + centered moving avg
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events").select(col("user_id"), col("event_id"),
        dround(sum(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_sum"),
        dround(avg(col("value")).over(w.rowsBetween(-2, 0)), 4)
          .as("moving_avg3"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- SQL entry point: GROUPING SETS (§2.10 SQL surface) -----------
    "q56_grouping_sets" -> ((s, d) => {
      // pre-aggregate to the (flag, status) grid BEFORE the grouping
      // sets: Expand otherwise multiplies every fact row by the number
      // of sets (3× the scan bytes through the aggregate at any scale);
      // over the tiny grid it expands 6 rows instead of the corpus
      graft.sql.GraftSql.sql(s, d,
        """WITH base AS (
          |  SELECT l_returnflag, l_linestatus, count(*) AS bn,
          |    sum(l_quantity) AS bq
          |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
          |SELECT l_returnflag, l_linestatus, sum(bn) AS n,
          |  round(sum(bq), 2) AS sum_qty
          |FROM base
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST,
          |  l_linestatus ASC NULLS FIRST, n""".stripMargin)
    }),

    // ---- bucketed co-located join (shuffle paid once at write) --------
    "q54_bucketed_join" -> ((s, d) => {
      import graft.ops.BucketedJoin
      // table names keyed to the sf dir: the one-time layout write
      // happens on the first run, every later run (Bench's warm
      // iteration, production re-queries) reads the co-located buckets
      val sfx = java.lang.Integer.toHexString(d.hashCode)
      val li = BucketedJoin.ensureBucketed(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity")),
        s"graft_li_bucketed_$sfx", buckets = 8, key = "l_orderkey")
      val ord = BucketedJoin.ensureBucketed(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice")),
        s"graft_ord_bucketed_$sfx", buckets = 8, key = "o_orderkey")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          dround(sum(col("l_quantity")), 2).as("sum_qty"),
          dround(max(col("o_totalprice")), 4).as("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- dedup clustering (transitive closure of near-dup pairs) ------
    "q59_dedup_clusters" -> ((s, d) => {
      // near-dup pairs at 0.95 (q44-proven recall at these LSH params)
      // → connected components → every doc labeled with its cluster
      // min. Consumes the session cluster-map ARTIFACT: the closure is
      // computed once and q113/q131 (same corpus, same params) read it
      // back — the pipeline-level shape; see DedupClusters.clusterMap
      // for the documented per-query-isolation exception
      graft.operators.DedupClusters.clusterMap(
        t(s, d, "documents"), "doc_id", "text", threshold = 0.95)
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy(col("doc_id"))
    }),

    // ---- embedding int8 quantization ----------------------------------
    "q60_embedding_quantize" -> ((s, d) => {
      graft.operators.Quantization.summary(
        t(s, d, "embeddings"), "vec_id", "embedding")
        .orderBy(col("vec_id"))
    }),

    // ---- z-order clustering (multi-column data skipping) --------------
    "q61_zorder_code" -> ((s, d) => {
      // the Morton code itself is the verifiable part of the layout op;
      // the file-skipping effect of ZOrder.layout is pinned in ZOrderSpec
      t(s, d, "orders").select(col("o_orderkey"),
        graft.ops.ZOrder.zvalue(
          Seq(col("o_custkey") % 256, col("o_orderkey") % 256), 8)
          .as("z"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- training-sequence layout: chunking + packing -----------------
    "q62_chunking" -> ((s, d) => {
      // 64-token chunks with 16-token overlap (step 48); narrow explode
      graft.operators.Chunking.chunkTokens(
        t(s, d, "documents"), "doc_id", "text",
        chunkSize = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    "q63_sequence_pack" -> ((s, d) => {
      // concat-then-cut packing into 512-token training sequences,
      // 8 independent shards (per-shard cumsum — no global ordering).
      // Lengths are BPE token counts under the 5-merge tokenizer
      // (q111's vocab), not whitespace words — the budget a training
      // run actually consumes; counting is a broadcast word→vocab
      // join, packing shuffles (id, n_tokens) rows only
      graft.operators.Chunking.packCounts(
        graft.operators.Bpe.encodeCounts(
          t(s, d, "documents"), "doc_id", "text", merges = 5),
        "doc_id", budget = 512, shards = 8)
        .orderBy(col("doc_id"))
    }),

    // ---- benchmark decontamination ------------------------------------
    "q65_decontam" -> ((s, d) => {
      // every 97th document plays the quarantined eval set; the rest is
      // the training corpus probed against its broadcast n-gram hashes
      val docs = t(s, d, "documents")
      graft.operators.Decontam.contaminationReport(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // ---- repetition signals (Gopher-style quality filter) -------------
    "q66_repetition" -> ((s, d) => {
      import graft.functions.TextFunctions.{dupNgramFrac, tokenCount}
      t(s, d, "documents").select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        dround(dupNgramFrac(col("text"), 1), 4).as("dup_unigram_frac"),
        dround(dupNgramFrac(col("text"), 2), 4).as("dup_bigram_frac"),
        dround(dupNgramFrac(col("text"), 3), 4).as("dup_trigram_frac"))
        .orderBy(col("doc_id"))
    }),

    // ---- SCD2 dimension history from an event log ---------------------
    "q67_scd2" -> ((s, d) => {
      graft.ops.Scd2.fromEventLog(
        t(s, d, "events"), "user_id", "event_type", "ts", "event_id")
        .orderBy(col("user_id"), col("valid_from"), col("event_type"))
    }),

    // ---- static corpus mixing (token-share rebalancing) ---------------
    "q68_corpus_mix" -> ((s, d) => {
      // rebalance four sources to a 40/30/20/10 token split; the rest
      // of the corpus is out of scope for this mixture
      graft.ops.CorpusMix.mixToTokenTargets(
        t(s, d, "documents"), "doc_id", "text", "source",
        Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))
        .orderBy(col("doc_id"))
    }),

    // ---- time-range rolling window ------------------------------------
    "q69_rolling_time" -> ((s, d) => {
      // trailing 10-minute per-user metrics via a RANGE frame over
      // exact epoch microseconds (integer range frames are
      // engine-portable where timestamp INTERVAL frames are not)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-600000000L, 0L)
      t(s, d, "events").select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_10m"),
        dround(sum(col("value")).over(w), 2).as("sum_10m"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- top n-gram share (boilerplate detector) ----------------------
    "q70_top_ngram" -> ((s, d) => {
      graft.operators.TextProfile.topNgramShare(
        t(s, d, "documents"), "doc_id", "text", n = 2)
        .orderBy(col("doc_id"))
    }),

    // ---- curation v2: + decontamination + repetition gates ------------
    "q71_curation_v2" -> ((s, d) => {
      val all = t(s, d, "documents")
      graft.batch.CurationJob.curateV2(
        all.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
        bench = all.filter(col("doc_id") % 97 === 0))
        .orderBy(col("doc_id"))
    }),

    // ---- bloom-filter join pruning ------------------------------------
    "q72_bloom_join" -> ((s, d) => {
      // dim keys → broadcast bloom sketch → fact pruned AT THE SCAN,
      // before the join exchange; the join keeps the result exact
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      graft.operators.BloomJoin.join(
          t(s, d, "lineitem"), "l_orderkey", urgent, "o_orderkey")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          dround(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- generic bounded-heap top-k per group -------------------------
    "q73_topk_per_group" -> ((s, d) => {
      // the same O(k)-state aggregate that ranks the ANN paths, on a
      // relational group-by: top-3 orders by price per priority with
      // map-side partials (groups×k rows cross the exchange, not the
      // full orders set as a window shuffle would)
      graft.functions.TopKByScore.explodeTopK(t(s, d, "orders"),
          Seq("o_orderpriority"), col("o_totalprice"),
          col("o_orderkey"), 3,
          outId = "o_orderkey", outScore = "o_totalprice")
        .select(col("o_orderpriority"), col("o_orderkey"),
          dround(col("o_totalprice"), 2).as("o_totalprice"), col("rn"))
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    // ---- deterministic stratified split -------------------------------
    "q74_stratified_split" -> ((s, d) => {
      // pure-function-of-(seed,id) assignment — stable across runs,
      // partitionings, and engines (oracle derives the SAME split)
      graft.ops.Splits.assign(t(s, d, "documents"), col("doc_id"), "graft")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("split"))
    }),

    // ---- mergeable distinct-count sketch rollup ------------------------
    "q75_sketch_rollup" -> ((s, d) => {
      // daily HLL partials → monthly union → estimate: the incremental
      // rollup pattern (persist daily sketches once; month/quarter/year
      // re-aggregations touch sketches, never the raw 100 TB again).
      // Envelope-checked against exact like q33 — the sketch itself is
      // impl-specific.
      val ev = t(s, d, "events")
      val daily = ev.groupBy(
          date_trunc("month", col("ts")).cast("date").as("month"),
          to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("__sk"))
      val monthly = daily.groupBy(col("month"))
        .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__approx"))
      val exact = ev.groupBy(
          date_trunc("month", col("ts")).cast("date").as("month"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      monthly.join(exact, Seq("month"))
        .select(col("month"), col("n_exact"),
          (abs(col("__approx") - col("n_exact")).cast("double") /
            col("n_exact") < 0.05).as("approx_ok"))
        .orderBy(col("month"))
    }),

    // ---- incremental near-dup admission --------------------------------
    "q76_incremental_dedup" -> ((s, d) => {
      // every 5th doc arrives as the new batch; the rest is the
      // standing corpus whose signature store was persisted earlier.
      // Threshold 0.95 = q44's proven-recall envelope at 16×4 bands.
      val docs = t(s, d, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val store = graft.operators.DedupOps.signatureStore(
        corpus, "doc_id", "text")
      graft.operators.DedupOps.incrementalNearDups(
        batch, corpus, store, "doc_id", "text", threshold = 0.95)
        .orderBy(col("id_new"), col("id_dup"))
    }),

    // ---- per-domain quota (corpus balancing) ---------------------------
    "q77_domain_cap" -> ((s, d) => {
      // at most 10 docs per source, picked by deterministic hash order;
      // bounded-heap aggregate — no corpus-wide window sort
      graft.ops.DomainCap.cap(t(s, d, "documents"),
        "doc_id", "source", k = 10, seed = "cap")
        .orderBy(col("source"), col("rn"))
    }),

    // ---- temperature up-sampling (epochs per source) -------------------
    "q78_upsample" -> ((s, d) => {
      // src0 repeats 2.5×, src1 1.25×; whole copies exact, fractional
      // remainder a deterministic per-doc hash coin (binary-exact
      // fractions so both engines quantize identically)
      graft.ops.CorpusMix.upsample(t(s, d, "documents"),
        "doc_id", "source", Map("src0" -> 2.5, "src1" -> 1.25))
        .orderBy(col("doc_id"), col("copy_idx"))
    }),

    // ---- single-pass column profiling ----------------------------------
    "q80_profile" -> ((s, d) => {
      // ANALYZE-TABLE shape: every column's stats in ONE scan; exact
      // distinct added here so the estimate is envelope-checked
      graft.ops.Profile.profile(t(s, d, "orders"), exact = true)
        .orderBy(col("col_name"))
    }),

    // ---- relative rank window functions --------------------------------
    "q81_percent_rank" -> ((s, d) => {
      // percent_rank / cume_dist / nth_value per priority; the compound
      // (price, key) order makes every row its own RANGE peer group, so
      // the default frame is engine-portable
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders").select(
        col("o_orderpriority"), col("o_orderkey"),
        dround(percent_rank().over(w), 6).as("pr"),
        dround(cume_dist().over(w), 6).as("cd"),
        dround(nth_value(col("o_totalprice"), 2).over(w), 2)
          .as("second_lowest"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // ---- date-spine zero-fill (calendar dimension generation) ----------
    "q82_date_spine" -> ((s, d) => {
      // gaps in the daily series become explicit zero rows: generate the
      // min..max day spine with sequence+explode (a 1-row agg → tiny
      // generated dim, broadcast back), left-join daily aggregates
      val o = t(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      val spine = o.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
        .select(explode(sequence(col("__d0"), col("__d1"))).as("day"))
      val daily = o.groupBy(col("day"))
        .agg(count(lit(1)).as("n_orders"),
          dround(sum(col("o_totalprice")), 2).as("revenue"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy(col("day"))
    }),

    // ---- winsorized (outlier-robust) statistics ------------------------
    "q83_winsorize" -> ((s, d) => {
      graft.ops.RobustStats.winsorized(
        t(s, d, "orders"), "o_totalprice", "o_orderstatus",
        pLo = 0.05, pHi = 0.95)
        .orderBy(col("o_orderstatus"))
    }),

    // ---- PMI bigram collocations ---------------------------------------
    "q84_pmi_bigrams" -> ((s, d) => {
      graft.operators.TextProfile.pmiBigrams(
        t(s, d, "documents"), "text", minCount = 5L)
        .orderBy(col("w1"), col("w2"))
    }),

    // ---- per-source token entropy (corpus diversity) -------------------
    "q85_entropy" -> ((s, d) => {
      graft.operators.TextProfile.tokenEntropy(
        t(s, d, "documents"), "source", "text")
        .orderBy(col("source"))
    }),

    // ---- higher-order array functions over embeddings ------------------
    "q86_hof_arrays" -> ((s, d) => {
      // transform / filter / aggregate stay inside codegen and fold each
      // list in element order — bitwise-identical accumulation on both
      // engines (cast to double FIRST so no float-precision forks)
      val v = col("embedding").cast("array<double>")
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(filter(v, x => x > lit(0.0))).as("n_pos"),
        dround(aggregate(v, lit(0.0), (acc, x) => acc + x * x), 4)
          .as("sum_sq"),
        dround(aggregate(v, lit(0.0), (acc, x) => acc + abs(x)), 4)
          .as("l1_norm"),
        dround(array_max(transform(v, x => abs(x))), 4).as("max_abs"))
        .orderBy(col("vec_id"))
    }),

    // ---- batch gap sessionization --------------------------------------
    "q87_sessionize_batch" -> ((s, d) => {
      // 30-minute inactivity gap; batch twin of q36's session_window
      graft.ops.Sessionize.byGap(
        t(s, d, "events"), "user_id", "ts", "event_id", "value",
        gapSec = 1800L)
        .orderBy(col("user_id"), col("session_id"))
    }),

    // ---- SemDeDup: cell-partitioned semantic dedup ---------------------
    "q88_semdedup" -> ((s, d) => {
      // drop docs with an above-threshold cosine neighbor of smaller id
      // in their IVF cell — cells from a 2-iteration trained codebook,
      // oversized cells split at 400 members; oracle replicates the
      // Lloyd rounds, argmax assignment (ties → smaller cell), the
      // md5 subcell split, and exact pair cosines
      graft.operators.SimilarityOps.semDedup(
        t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.95, cells = 16, trainIters = 2,
        maxCellSize = 400)
        .orderBy(col("vec_id"))
    }),

    // ---- mergeable frequency sketch (count-min heavy hitters) ----------
    "q89_heavy_hitters" -> ((s, d) => {
      // daily count-min partials → one union → point-estimate the exact
      // top-10 keys; CMS never undercounts, and the 1%-of-total
      // overcount envelope holds w.p. 1-e^-depth per key. Like q75:
      // persist daily sketches once, re-roll any coarser grain from
      // depth×width longs per day instead of the raw 100 TB.
      import graft.functions.CountMin
      val ev = t(s, d, "events")
      val daily = ev.groupBy(to_date(col("ts")).as("__day"))
        .agg(CountMin.agg(col("user_id")).as("__sk"))
      val merged = daily.agg(CountMin.mergeAgg(col("__sk")).as("__sk"))
      val top = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id")).limit(10)
      val est = CountMin.estimate(col("__sk"), col("user_id"))
      top.crossJoin(broadcast(merged))
        .select(col("user_id"), col("n_exact"),
          (est >= col("n_exact") &&
            (est - col("n_exact")).cast("double") <=
              CountMin.total(col("__sk")).cast("double") * 0.01)
            .as("approx_ok"))
        .orderBy(col("user_id"))
    }),

    // ---- LM-style trigram log-probability (perplexity filter) ----------
    "q90_lm_score" -> ((s, d) => {
      // corpus-self-estimated trigram LM: mean ln(c3/c2) per doc — the
      // CCNet-shaped quality signal; digests shuffle, never n-grams
      graft.operators.TextProfile.lmTrigramScore(
        t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ---- CDC change-log apply ------------------------------------------
    "q91_cdc_apply" -> ((s, d) => {
      // orders replayed as a change log onto the customer snapshot:
      // latest op per key wins (seq = order key), 'P' deletes,
      // 'O' inserts, 'F' updates; one log shuffle, base never sorted
      val base = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val log = t(s, d, "orders").select(
        col("o_custkey").as("c_custkey"),
        when(col("o_orderstatus") === "P", "D")
          .when(col("o_orderstatus") === "O", "I").otherwise("U")
          .as("op"),
        col("o_orderkey").as("seq"),
        concat(lit("cust-"), col("o_orderkey")).as("c_name"),
        col("o_orderpriority").as("c_mktsegment"))
      graft.ops.Cdc.apply(base, log, "c_custkey", "op", "seq",
        Seq("c_name", "c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // ---- mergeable quantile-sketch rollup ------------------------------
    "q92_quantile_rollup" -> ((s, d) => {
      // hourly GK-summary partials → per-day merge → p50/p95 point
      // queries, rank-checked against the raw rows: the count of
      // values ≤ estimate must sit within 2ε of the target rank.
      // Completes the sketch family (q75 HLL distincts, q89 CMS
      // frequencies): persist fine-grain sketches once, any coarser
      // grain re-aggregates kilobyte summaries, not the raw 100 TB.
      import graft.functions.QuantileSketch
      val ev = t(s, d, "events").select(
        to_date(col("ts")).as("day"),
        hour(col("ts")).as("__hour"), col("value"))
      val hourly = ev.groupBy(col("day"), col("__hour"))
        .agg(QuantileSketch.agg(col("value"), 0.01).as("__sk"))
      val daily = hourly.groupBy(col("day"))
        .agg(QuantileSketch.mergeAgg(col("__sk")).as("__sk"))
        .select(col("day"),
          QuantileSketch.query(col("__sk"), lit(0.5)).as("__p50"),
          QuantileSketch.query(col("__sk"), lit(0.95)).as("__p95"))
      ev.join(broadcast(daily), Seq("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          (abs(sum(when(col("value") <= col("__p50"), 1L).otherwise(0L))
            .cast("double") / count(lit(1)) - 0.5) <= 0.02).as("ok50"),
          (abs(sum(when(col("value") <= col("__p95"), 1L).otherwise(0L))
            .cast("double") / count(lit(1)) - 0.95) <= 0.02).as("ok95"))
        .orderBy(col("day"))
    }),

    // ---- asymmetric containment similarity (subset-duplicates) ---------
    "q93_containment" -> ((s, d) => {
      // containment(a→b) = |A∩B| / |A| over distinct 3-gram sets —
      // catches a doc CONTAINED in a longer one, which symmetric
      // Jaccard dilutes below threshold; directional, so both (a,b)
      // and (b,a) rows exist. Same bounded-verifier shape as q26
      // (broadcast one pre-shingled side; production pairing comes
      // from the LSH band candidates, ref q24/q76)
      val doc = t(s, d, "documents").filter(col("doc_id") < 100)
        .withColumn("sh",
          array_distinct(DedupOps.shingles(col("text"), 3)))
      val a = doc.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = doc.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
      a.crossJoin(broadcast(b)).filter(col("id_a") =!= col("id_b"))
        .withColumn("containment", dround(
          when(size(col("sh_a")) === 0, lit(0.0))
            .otherwise(size(array_intersect(col("sh_a"), col("sh_b")))
              .cast("double") / size(col("sh_a")).cast("double")), 4))
        .filter(col("containment") >= 0.02)
        .select(col("id_a"), col("id_b"), col("containment"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- weighted sampling (A-ES, no global sort) ----------------------
    "q94_weighted_sample" -> ((s, d) => {
      // length-weighted corpus draw: inclusion probability ∝ token
      // count, deterministic (md5-derived uniforms), ranked through
      // the O(k)-state bounded heap — the oracle reproduces the
      // IDENTICAL draw from the same hash arithmetic in SQL
      import graft.functions.TextFunctions
      val docs = t(s, d, "documents").select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
      graft.ops.DeterministicSample.weightedTopK(
          docs, "doc_id", "n_tokens", k = 25, seed = "wsample")
        .join(docs, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("sample_key"),
          col("rn"))
        .orderBy(col("rn"))
    }),

    // ---- k-means M-step (codebook training) ----------------------------
    "q95_kmeans_step" -> ((s, d) => {
      // nearest-centroid assignment (narrow map) + per-(cell, dim)
      // means: the iteration that trains the codebook q40/q88 consume;
      // oracle replicates assignment and averages in SQL
      graft.operators.SimilarityOps.kmeansStep(
        t(s, d, "embeddings"), "vec_id", "embedding", cells = 16)
        .orderBy(col("cell"), col("dim"))
    }),

    // ---- denoising corruption (T5-style masking) -----------------------
    "q96_span_corrupt" -> ((s, d) => {
      // ~16 % of tokens masked by md5(seed:doc:pos) — reproducible
      // training pairs, all in-row higher-order expressions (zero
      // shuffle); the oracle rebuilds the identical corruption
      graft.operators.Masking.spanCorrupt(
        t(s, d, "documents"), "doc_id", "text",
        seed = "t5", threshold256 = 42)
        .orderBy(col("doc_id"))
    }),

    // ---- TPC-H-shaped macro queries (multi-join star plans) ------------
    "q97_shipping_priority" -> ((s, d) => {
      // TPC-H Q3 shape: segment-filtered customers × date-bounded
      // orders × lineitem, revenue per (order, date, priority),
      // top-10. Customer filter broadcast-prunes orders BEFORE the
      // fact join; both filters push to the scans
      val cut = lit("1997-06-30").cast("date")
      val c = t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = t(s, d, "orders")
        .filter(to_date(col("o_orderdate")) < cut)
        .join(c, col("o_custkey") === col("c_custkey"))
      val l = t(s, d, "lineitem")
        .filter(to_date(col("l_shipdate")) > cut)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          to_date(col("o_orderdate")).as("o_date"),
          col("o_orderpriority"))
        .agg(dround(sum(col("l_extendedprice") *
          (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q98_local_supplier_volume" -> ((s, d) => {
      // TPC-H Q5 shape: full star traversal — region → nation →
      // customer → orders → lineitem ⋈ supplier, revenue where the
      // supplier sits in the customer's nation. Dims broadcast down
      // the chain; the only big shuffle is lineitem⋈orders
      val cut = lit("1997-01-01").cast("date")
      val n = t(s, d, "nation")
        .join(t(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
      val c = t(s, d, "customer")
        .join(n, col("c_nationkey") === col("n_nationkey"))
      val o = t(s, d, "orders")
        .filter(to_date(col("o_orderdate")) >= cut &&
          to_date(col("o_orderdate")) < lit("1999-01-01").cast("date"))
        .join(c, col("o_custkey") === col("c_custkey"))
      val sup = t(s, d, "supplier")
      t(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(dround(sum(col("l_extendedprice") *
          (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ---- end-to-end training export (capstone composition) -----------
    "q122_training_export" -> ((s, d) => {
      // quality gate → exact dedup → 512-token sequence packing across
      // 4 shards → seeded training-order address: each stage is the
      // already-oracle-proven operator (q21/q23/q63/q114), composed
      // the way a production export job runs them. Sequence lengths
      // are BPE token counts under the 5-merge tokenizer (q111's
      // vocab — trained over the FULL corpus, applied post-gate), the
      // budget a training run actually consumes. Text never crosses
      // an exchange after the gate: the word→vocab count join is
      // broadcast, dedup shuffles digests, packing and ordering
      // shuffle (id, n_tokens)-sized rows
      val docs = t(s, d, "documents")
      val (_, vocab) = graft.operators.Bpe.trainWithVocabCached(
        docs, "text", merges = 5)
      // one gated text-reading pass: digest and exploded words ride
      // the same scan; after the partial agg, only (id, digest,
      // n_tokens) rows reach an exchange. `base` feeds keepers, clean,
      // packing AND ordering — materialize it so the gated corpus scan
      // runs ONCE, not once per downstream consumer (at 100 TB the
      // corpus re-read would quadruple the dominant I/O)
      val base = graft.core.Scratch.materialize(docs
        .filter(TextFunctions.qualityScore(col("text")) >= 0.3)
        .select(col("doc_id"), md5(col("text")).as("__dg"),
          explode_outer(TextFunctions.tokens(lower(col("text"))))
            .as("word"))
        .join(broadcast(graft.operators.Bpe.perWordCounts(vocab)),
          Seq("word"), "left")
        .groupBy(col("doc_id"))
        .agg(first(col("__dg")).as("__dg"),
          coalesce(sum(col("__nsym")), lit(0L)).as("n_tokens")),
        "q122_base")
      val keepers = base.groupBy(col("__dg"))
        .agg(min(col("doc_id")).as("doc_id"))
      // clean feeds both packing and ordering — materialize so the
      // digest-dedup shuffle also runs once
      val clean = graft.core.Scratch.materialize(
        base.join(keepers, Seq("__dg", "doc_id"))
          .select(col("doc_id"), col("n_tokens")),
        "q122_clean")
      val packed = graft.operators.Chunking.packCounts(
        clean, "doc_id", budget = 512, shards = 4)
        .select(col("doc_id"), col("n_tokens"), col("shard"),
          col("pack_id"), col("offset_in_pack"))
      val order = graft.operators.ShardExport.trainingOrder(
        clean, "doc_id", seed = 7L, shards = 4)
        .select(col("doc_id"), col("shard").as("order_shard"),
          col("pos").as("order_pos"))
      packed.join(order, Seq("doc_id")).orderBy(col("doc_id"))
    }),

    // ---- blocklist phrase filtering -----------------------------------
    "q124_blocklist" -> ((s, d) => {
      // substring semantics across token boundaries — the compliance
      // stage; a bounded list needs no join: one in-row array filter
      graft.operators.Blocklist.flagPhrases(
        t(s, d, "documents"), "doc_id", "text",
        Seq("slow fast", "big table", "key agg", "forbidden phrase"))
        .orderBy(col("doc_id"))
    }),

    // ---- per-source curation funnel report ----------------------------
    "q123_curation_funnel" -> ((s, d) => {
      // the pipeline observability query: per source, how many docs
      // and tokens survive the quality gate and exact dedup. One
      // text-reading pass; the digest agg and source rollup shuffle
      // narrow rows only
      val docs = t(s, d, "documents")
      // base feeds both the keeper derivation and the rollup —
      // materialize so the text-reading pass (digest + token count +
      // quality score over every doc) runs once
      val base = graft.core.Scratch.materialize(
        docs.select(col("doc_id"), col("source"),
          md5(col("text")).as("__dg"),
          TextFunctions.tokenCount(col("text")).cast("long")
            .as("n_tokens"),
          (TextFunctions.qualityScore(col("text")) >= 0.3)
            .as("__gated")),
        "q123_base")
      val keepers = base.filter(col("__gated"))
        .groupBy(col("__dg")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), lit(true).as("__kept"))
      base.join(keepers, Seq("doc_id"), "left")
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("__gated"), 1L).otherwise(0L)).as("n_gated"),
          sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("n_tokens")).as("tokens_total"),
          sum(when(col("__kept"), col("n_tokens")).otherwise(0L))
            .as("tokens_kept"))
        .orderBy(col("source"))
    }),

    // ---- TPC-H Q8 shape: market share ----------------------------------
    "q121_market_share" -> ((s, d) => {
      // 6-table traversal: per order-year, NATION_1 suppliers' share
      // of ECONOMY-part revenue sold into AMERICA. All four dims
      // (part filter, supplier+nation, customer-side chain) broadcast;
      // the only big shuffles are lineitem⋈orders and the year agg —
      // the join-reorder/broadcast stress test at 100 TB
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val supN = t(s, d, "supplier")
        .join(t(s, d, "nation")
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation")),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val custAmerica = t(s, d, "customer")
        .join(t(s, d, "nation")
          .join(t(s, d, "region").filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ord = t(s, d, "orders")
        .filter(to_date(col("o_orderdate")) >=
            lit("1995-01-01").cast("date") &&
          to_date(col("o_orderdate")) <=
            lit("1996-12-31").cast("date"))
        .join(custAmerica, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"))
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          dround(sum(when(col("supp_nation") === "NATION_1", vol)
            .otherwise(lit(0.0))), 2).as("nation_volume"),
          dround(sum(vol), 2).as("total_volume"))
        .withColumn("mkt_share",
          dround(col("nation_volume") / col("total_volume"), 4))
        .orderBy(col("o_year"))
    }),

    // ---- ordered funnel analysis ---------------------------------------
    "q99_funnel" -> ((s, d) => {
      // signup → click → purchase, each step strictly after the
      // previous one, in ONE scan of events and ONE Exchange: a single
      // per-user agg takes min signup ts plus the per-type ts lists,
      // then t2/t3 fall out of in-row array folds (a comparison with a
      // null prior step is null, so filter drops it and the step stays
      // null — the same strictly-after semantics as the staged joins).
      // The collected lists hold only this user's click/purchase
      // timestamps — funnel-step events, not the whole event row
      val ev = t(s, d, "events")
      val s3 = ev.groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", col("ts")))
            .as("__t1"),
          collect_list(when(col("event_type") === "click", col("ts")))
            .as("__clicks"),
          collect_list(when(col("event_type") === "purchase",
            col("ts"))).as("__purchases"))
        .withColumn("__t2", array_min(
          filter(col("__clicks"), c => c > col("__t1"))))
        .withColumn("__t3", array_min(
          filter(col("__purchases"), p => p > col("__t2"))))
      s3.select(col("user_id"),
        col("__t1").isNotNull.as("did_signup"),
        col("__t2").isNotNull.as("did_click_after"),
        col("__t3").isNotNull.as("did_purchase_after"),
        col("__t3").as("purchase_ts"))
        .orderBy(col("user_id"))
    }),

    // ---- retention cohorts ---------------------------------------------
    "q100_retention" -> ((s, d) => {
      // weekly cohort (first-seen week) × weeks-since-cohort active
      // counts: two distinct-shuffles on (user, week), the standard
      // retention-matrix shape
      val ev = t(s, d, "events").select(col("user_id"),
        (floor(datediff(to_date(col("ts")),
          lit("1995-01-02").cast("date")) / 7)).cast("long").as("week"))
      val uw = ev.distinct()
      val cohort = uw.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      uw.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("weeks_since"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_week"), col("weeks_since"))
    }),

    // ---- unpivot / melt (wide → long reshaping) -----------------------
    "q64_unpivot" -> ((s, d) => {
      val wide = t(s, d, "orders").groupBy(col("o_orderstatus")).agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L)).as("n_urgent"),
        sum(when(col("o_orderpriority") === "5-LOW", 1L)
          .otherwise(0L)).as("n_low"))
      wide.unpivot(
        Array(col("o_orderstatus")),
        Array(col("n_urgent"), col("n_low")),
        "priority", "n")
        .orderBy(col("o_orderstatus"), col("priority"))
    }),

    // ---- k-means training loop (Lloyd iterations) ----------------------
    "q101_kmeans_train" -> ((s, d) => {
      // the trained codebook itself, long-form: 2 assign+mean rounds
      // from the first-16-by-id init, means rounded 6 dp per round so
      // the oracle's unrolled SQL reproduces it bit-for-bit; empty
      // cells carry their previous centroid
      import s.implicits._
      val cb = graft.operators.SimilarityOps.kmeansTrain(
        t(s, d, "embeddings"), "vec_id", "embedding",
        cells = 16, iters = 2)
      cb.zipWithIndex.flatMap { case (v, cell) =>
        v.zipWithIndex.map { case (x, dim) => (cell, dim, x) }
      }.toSeq.toDF("cell", "dim", "mean_val")
        .orderBy(col("cell"), col("dim"))
    }),

    // ---- cell-skew guard: capped semantic dedup ------------------------
    "q102_capped_semdedup" -> ((s, d) => {
      // 4 coarse cells (~125 members each at sf0.01) with a 16-member
      // cap force the md5 subcell split on every cell — the guard that
      // bounds Σ|cell|² when a mega-cell shows up at 100 TB; oracle
      // replicates the split hash and within-subcell pair cosines
      graft.operators.SimilarityOps.semDedup(
        t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.2, cells = 4, trainIters = 0, maxCellSize = 16)
        .orderBy(col("vec_id"))
    }),

    // ---- hash fixtures for the LSH oracles -----------------------------
    // The raw hash families (xxhash64 banding, SimHash64, hyperplane
    // signs) are not DuckDB-replicable, so q24/q25/q30 dump them here
    // and their oracles recompute EVERYTHING downstream — banding join,
    // candidate dedup, hamming/jaccard/cosine verification — in SQL
    // from these fixtures (read via __VERIFY_OUT__, substituted by
    // Verify). Only the hash value itself stays property-tested
    // (TextDedupSpec / SimilaritySpec).
    "q103_simhash_fixture" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), DedupOps.simhash64(col("text")).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    "q104_minhash_band_fixture" -> ((s, d) => {
      // identical params to q24: 3-shingles, 64 hashes, 16 bands × 4
      DedupOps.signatureStore(t(s, d, "documents"), "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4)
        .orderBy(col("doc_id"), col("band"))
    }),

    "q105_lsh_bucket_fixture" -> ((s, d) => {
      // identical params to q30: 8 sign-tables × 8 bits
      val v = t(s, d, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<double>").as("__v"))
      v.select(col("vec_id"),
        graft.operators.SimilarityOps.lshTables(col("__v"), bits = 8,
          tables = 8).as(Seq("tbl", "bucket")))
        .orderBy(col("vec_id"), col("tbl"))
    }),

    // ---- fingerprint equivalence classes (closes q27's semantics) ------
    "q106_fingerprint_groups" -> ((s, d) => {
      // the oracle groups by the normalized token stream itself, so the
      // xxhash64 fingerprint's equivalence classes are fully checked
      // even though the hash value (q27) is not DuckDB-replicable
      DedupOps.fingerprintGroups(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // ---- data selection under a token budget ---------------------------
    "q107_token_budget" -> ((s, d) => {
      graft.ops.TokenBudget.selectToBudget(
        t(s, d, "documents"), "doc_id", "text", budget = 10000L)
        .orderBy(col("doc_id"))
    }),

    // ---- DSIR importance weights (hashed-bigram log-ratio) -------------
    "q108_dsir_weights" -> ((s, d) => {
      // target distribution = src0 docs; background = the rest
      graft.operators.Dsir.importanceWeights(
        t(s, d, "documents"), "doc_id", "text",
        isTarget = col("source") === "src0")
        .orderBy(col("doc_id"))
    }),

    // ---- winnowing fingerprints (MOSS; rolling k-gram hash) ------------
    "q109_winnowing" -> ((s, d) => {
      graft.operators.Winnowing.fingerprints(
        t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"), col("fp"))
    }),

    "q110_overlap_pairs" -> ((s, d) => {
      graft.operators.Winnowing.overlapPairs(
        t(s, d, "documents"), "doc_id", "text",
        minShared = 2, maxDocFreq = 50)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- BPE merge training (subword tokenizer induction) --------------
    "q111_bpe_merges" -> ((s, d) => {
      // 5 merge iterations over the weighted word vocab; the oracle
      // unrolls the same loop in SQL (argmax is count desc, pair asc)
      graft.operators.Bpe.mergesDF(s, t(s, d, "documents"), "text",
        merges = 5)
        .orderBy(col("step"))
    }),

    // ---- BPE encoding (tokenize the corpus with learned merges) -------
    "q112_bpe_encode" -> ((s, d) => {
      // per-doc token counts under the 5-merge tokenizer; the merge
      // applications run on the vocab table, never on the corpus text
      graft.operators.Bpe.encodeStats(
        t(s, d, "documents"), "doc_id", "text", merges = 5)
        .orderBy(col("doc_id"))
    }),

    // ---- BPE tokenization (real token-id sequences) -------------------
    "q125_bpe_token_ids" -> ((s, d) => {
      // the tokenizer's true output: per-doc BPE token-id sequences
      // under the 5-merge vocab; ids are sorted-symbol ranks the
      // oracle re-derives in SQL. The sequence is serialized to csv
      // for the compare (the driver's comparator can't hash array
      // cells) — Bpe.encode itself returns the array<int>
      graft.operators.Bpe.encode(
        t(s, d, "documents"), "doc_id", "text", merges = 5)
        .select(col("doc_id"),
          array_join(col("token_ids"), ",").as("token_ids_csv"),
          col("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ---- duplicated-span removal (Lee 2022 remedy) --------------------
    "q126_span_removal" -> ((s, d) => {
      // drop corpus-repeated 5-token windows, keep the rest of the
      // document: the exact-substring dedup fix that preserves
      // documents instead of discarding them (q119 is the signal,
      // this is the edit). Digests and int start-positions shuffle;
      // the one text exchange is the rewrite join itself
      graft.operators.SpanDedup.removeDupSpans(
        t(s, d, "documents"), "doc_id", "text", k = 5)
        .orderBy(col("doc_id"))
    }),

    // ---- REAL BMP pixel decode ----------------------------------------
    "q127_bmp_decode" -> ((s, d) => {
      // uncompressed-BMP pixel statistics decoded from the container
      // bytes by a codegen'd expression (MediaDecode) — per-channel
      // means over every pixel, exact integer sums inside the
      // expression, rounding only at the surface. The oracle
      // recomputes the same stats from the generator's closed-form
      // pixel formulas, so padding/BGR/row-order decode defects fail
      // the compare. Narrow map over the asset scan: no shuffle
      // before the output ordering, corpus-parallel at any scale.
      val mm = graft.multimodal.MultimodalOps
      val st = graft.multimodal.MediaDecode
        .bmpColumn(col("media_bytes"))
      mm.syntheticDecodableAssets(s, 120)
        .filter(col("modality") === "image")
        .select(col("asset_id"), st.as("__st"))
        .filter(col("__st").isNotNull)
        .select(col("asset_id"),
          col("__st.width").cast("long").as("width"),
          col("__st.height").cast("long").as("height"),
          col("__st.n_pixels").as("n_pixels"),
          (dround(col("__st.sum_r").cast("double") /
            col("__st.n_pixels"), 6) + lit(0)).as("mean_r"),
          (dround(col("__st.sum_g").cast("double") /
            col("__st.n_pixels"), 6) + lit(0)).as("mean_g"),
          (dround(col("__st.sum_b").cast("double") /
            col("__st.n_pixels"), 6) + lit(0)).as("mean_b"))
        .orderBy(col("asset_id"))
    }),

    // ---- REAL WAV PCM decode ------------------------------------------
    "q128_wav_decode" -> ((s, d) => {
      // 16-bit PCM sample statistics decoded via the RIFF chunk walk
      // (MediaDecode): mean amplitude, RMS, peak — the audio-QA
      // triple a crawled-media pipeline gates on. Same oracle
      // principle as q127: DuckDB re-derives the stats from the
      // generator's sample formula; a sign-extension or chunk-offset
      // bug in the decoder breaks the match.
      val mm = graft.multimodal.MultimodalOps
      val st = graft.multimodal.MediaDecode
        .wavColumn(col("media_bytes"))
      mm.syntheticDecodableAssets(s, 120)
        .filter(col("modality") === "audio")
        .select(col("asset_id"), st.as("__st"))
        .filter(col("__st").isNotNull)
        .select(col("asset_id"),
          col("__st.sample_rate").cast("long").as("sample_rate"),
          col("__st.n_samples").as("n_samples"),
          (dround(col("__st.sum_amp").cast("double") /
            col("__st.n_samples"), 6) + lit(0)).as("mean_amp"),
          (dround(sqrt(col("__st.sum_sq").cast("double") /
            col("__st.n_samples")), 6) + lit(0)).as("rms"),
          col("__st.peak_abs").cast("long").as("peak_abs"))
        .orderBy(col("asset_id"))
    }),

    // ---- REAL PNG pixel decode ----------------------------------------
    "q161_png_decode" -> ((s, d) => {
      // PNG pixel statistics decoded from the actual container bytes
      // by a codegen'd expression (MediaDecode.pngStats): chunk walk
      // with CRC validation, IDAT inflate through the JDK's zlib, and
      // per-row unfilter across all five PNG filter types (the
      // fixture cycles them by row). The oracle recomputes the same
      // per-channel means from the generator's closed-form pixel
      // formulas, so a defect anywhere in the decode chain —
      // signature, CRC, multi-chunk inflate, Sub/Up/Average/Paeth
      // reconstruction, RGB vs RGBA stride — fails the compare.
      // Narrow map over the asset scan, no shuffle before the output
      // ordering; undecodable assets (every third is noise) null out.
      val mm = graft.multimodal.MultimodalOps
      val st = graft.multimodal.MediaDecode
        .pngColumn(col("media_bytes"))
      mm.syntheticPngAssets(s, 120)
        .select(col("asset_id"), st.as("__st"))
        .filter(col("__st").isNotNull)
        .select(col("asset_id"),
          col("__st.width").cast("long").as("width"),
          col("__st.height").cast("long").as("height"),
          col("__st.channels").cast("long").as("channels"),
          col("__st.n_pixels").as("n_pixels"),
          (dround(col("__st.sum_r").cast("double") /
            col("__st.n_pixels"), 6) + lit(0)).as("mean_r"),
          (dround(col("__st.sum_g").cast("double") /
            col("__st.n_pixels"), 6) + lit(0)).as("mean_g"),
          (dround(col("__st.sum_b").cast("double") /
            col("__st.n_pixels"), 6) + lit(0)).as("mean_b"),
          when(col("__st.channels") === 4,
            dround(col("__st.sum_a").cast("double") /
              col("__st.n_pixels"), 6) + lit(0)).as("mean_a"))
        .orderBy(col("asset_id"))
    }),

    // ---- REAL gzip payload decode -------------------------------------
    "q162_gzip_decode" -> ((s, d) => {
      // gzipped document records decompressed in-flight by a
      // codegen'd expression (Gunzip: RFC 1952 header walk, raw
      // inflate through the JDK's zlib, CRC32 + ISIZE trailer
      // validation) — the ingestion shape of a crawled corpus. The
      // oracle rebuilds each document's exact text from the fixture's
      // closed-form token formula and compares an md5 of it, so any
      // decompression defect breaks the match; corrupted payloads
      // (every third has a flipped byte — CRC catches it) null out.
      // Narrow map over the scan, no shuffle before the ordering.
      val gz = graft.functions.Gunzip
      gz.syntheticGzipDocs(s, 120)
        .select(col("doc_id"), gz.textColumn(col("gz_bytes")).as("text"))
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          md5(col("text").cast("binary")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // ---- URL canonicalization -----------------------------------------
    "q167_url_canon" -> ((s, d) => {
      // RFC 3986 syntax-based normalization — the crawl-level dedup
      // precursor: lowercase scheme/host, drop userinfo, strip
      // default ports, collapse/trim path slashes, drop fragments;
      // non-URLs canonicalize to null. Pure composition of codegen'd
      // builtins with RE2-portable patterns, so the oracle replays
      // the identical regex pipeline over the same closed-form
      // fixture strings. Narrow map, no shuffle before the ordering
      graft.ops.UrlCanon.withCanonical(
          graft.ops.UrlCanon.syntheticUrls(s, 110), "url")
        .select(col("url_id"), col("url"), col("canon_url"),
          col("url_host"))
        .orderBy(col("url_id"))
    }),

    // ---- exact set-similarity join (prefix filtering) -----------------
    "q168_setsim_join" -> ((s, d) => {
      // AllPairs/PPJoin-style EXACT threshold-Jaccard self-join over
      // 3-shingle sets — the no-false-negative twin of the MinHash
      // path (q24): same planted near-dups, but recall is provable,
      // not probabilistic. Prefix filtering under a rarest-first
      // global token order keeps the candidate join tiny (only
      // ~(1-t)·|set| tokens per doc are probed, and hot tokens sort
      // out of the prefixes); candidates then verify with the exact
      // codegen'd array_intersect. Three keyed shuffles, no n².
      graft.operators.SetSimJoin.shingleJoin(
          t(s, d, "documents"), "doc_id", "text", n = 3,
          threshold = 0.5)
        .select(col("id_a"), col("id_b"),
          dround(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- incremental aggregate maintenance ----------------------------
    "q169_incremental_agg" -> ((s, d) => {
      // materialized-view maintenance: the corpus lands in three
      // appends and the (source, lang) aggregate is refreshed after
      // each — refreshes 2 and 3 scan ONLY the appended files and
      // merge with a keys-sized join (mode asserted: the scale path
      // must actually run, not silently fall back to recompute). The
      // oracle is the plain GROUP BY over the full corpus: delta
      // maintenance must be indistinguishable from recompute
      val docs = t(s, d, "documents")
      val root = s"${graft.core.Scratch.root(docs)}/incagg_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (base, agg) = (s"$root/base", s"$root/agg")
      val keys = Seq("source", "lang")
      for (i <- 0 to 2) {
        graft.core.VersionedTable.commitAppend(
          docs.filter(pmod(col("doc_id"), lit(3)) === i), base)
        val r = graft.ops.IncrementalAgg.maintain(
          s, base, agg, keys, "n_chars")
        require(i == 0 || r.mode == "incremental",
          s"append $i refreshed via ${r.mode}, not the delta path")
      }
      graft.ops.IncrementalAgg.read(s, agg)
        .orderBy(col("source"), col("lang"))
    }),

    "q180_incremental_minmax" -> ((s, d) => {
      // q169's delta discipline extended to extrema: min/max are
      // mergeable under the SAME append-only lineage gate (an append
      // can only introduce a new extremum, never retire one), so
      // refreshes 2 and 3 still scan only the appended files; any
      // rewrite lineage falls back to recompute — exactly where a
      // retired extremum would go stale (spec'd)
      val docs = t(s, d, "documents")
      val root = s"${graft.core.Scratch.root(docs)}/incmm_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (base, agg) = (s"$root/base", s"$root/agg")
      val keys = Seq("source", "lang")
      for (i <- 0 to 2) {
        graft.core.VersionedTable.commitAppend(
          docs.filter(pmod(col("doc_id"), lit(3)) === i), base)
        val r = graft.ops.IncrementalAgg.maintain(
          s, base, agg, keys, "n_chars", minMax = true)
        require(i == 0 || r.mode == "incremental",
          s"append $i refreshed via ${r.mode}, not the delta path")
      }
      graft.ops.IncrementalAgg.read(s, agg)
        .orderBy(col("source"), col("lang"))
    }),

    "q181_sketch_view" -> ((s, d) => {
      // sketch-backed materialized view: distinct users (HLL) and
      // value percentiles (GK) per event_type maintained from DELTA
      // FILES ONLY across three appends — state exact distinct/
      // percentile cannot carry incrementally (it is the full value
      // multiset), mergeable sketches can. Checks are the q75/q92
      // envelope discipline: exact n_rows from the view, HLL within
      // 5% of the exact distinct, GK point estimates within 3% rank
      // error (ε=0.01 degrading conservatively over the merge tree)
      val ev = t(s, d, "events")
      val root = s"${graft.core.Scratch.root(ev)}/sketchview_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (base, agg) = (s"$root/base", s"$root/agg")
      for (i <- 0 to 2) {
        graft.core.VersionedTable.commitAppend(
          ev.filter(pmod(col("event_id"), lit(3)) === i), base)
        val r = graft.ops.IncrementalAgg.maintainSketch(
          s, base, agg, Seq("event_type"), "user_id", "value")
        require(i == 0 || r.mode == "incremental",
          s"append $i refreshed via ${r.mode}, not the delta path")
      }
      val sk = graft.ops.IncrementalAgg.readSketch(s, agg)
      val exact = ev.groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("__nd"))
      val est = sk.join(exact, Seq("event_type")).select(
        col("event_type"), col("n_rows"),
        (abs(col("approx_distinct") - col("__nd")) <=
          col("__nd").cast("double") * 0.05).as("ok_distinct"),
        col("p50"), col("p95"))
      ev.select(col("event_type"), col("value"))
        .join(broadcast(est), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(first(col("n_rows")).as("n_rows"),
          first(col("ok_distinct")).as("ok_distinct"),
          (abs(sum(when(col("value") <= col("p50"), 1L).otherwise(0L))
            .cast("double") / count(lit(1)) - 0.5) <= 0.03).as("ok50"),
          (abs(sum(when(col("value") <= col("p95"), 1L).otherwise(0L))
            .cast("double") / count(lit(1)) - 0.95) <= 0.03).as("ok95"))
        .orderBy(col("event_type"))
    }),

    // ---- bloom file-skipping point lookup -----------------------------
    "q170_bloom_skip" -> ((s, d) => {
      // equality-predicate data skipping: doc_id hash-interleaves
      // across the 8 committed files, so every file's [min, max]
      // envelope spans the whole id domain and range pruning keeps
      // all of them — the per-file Bloom sidecar keeps only the
      // files that (probably) hold the probed keys, and the
      // row-level re-filter makes the result exact (fp-proof).
      // Pruning effectiveness is pinned in BloomSkipSpec
      val docs = t(s, d, "documents")
      val root = s"${graft.core.Scratch.root(docs)}/bloomskip_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val base = s"$root/t"
      graft.core.VersionedTable.commitAppend(
        docs.repartition(8, col("doc_id")), base)
      graft.core.VersionedTable.publishBloom(s, base, "doc_id")
      val keys = Seq(3L, 77L, 202L, 333L, 444L)
      graft.core.VersionedTable.readPointLookup(s, base, "doc_id", keys)
        .filter(col("doc_id").isin(keys: _*))
        .select(col("doc_id"), col("source"), col("lang"),
          col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ---- compression-ratio quality signal -----------------------------
    "q171_compress_ratio" -> ((s, d) => {
      // deflate-the-bytes repetitiveness filter (the curation signal
      // the n-gram heuristics approximate, computed by an actual
      // compressor; template spam compresses far below prose).
      // NO DuckDB oracle exists (SQL exposes no deflate) → rows-only
      // row, like q39; correctness rides DeflateRatioSpec's lossless
      // roundtrip law against the independent Inflater decode.
      // Narrow codegen'd map over the scan, no shuffle before the sort
      val dl = graft.functions.Deflate
      t(s, d, "documents")
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          dl.column(col("text")).cast("long").as("deflate_len"),
          dround(dl.ratio(col("text")), 4).as("ratio"))
        .withColumn("too_repetitive", col("ratio") < 0.42)
        .orderBy(col("doc_id"))
    }),

    "q187_compress_gate" -> ((s, d) => {
      // the q171 codec's DOWNSTREAM curation gate, fixture-oracled
      // the q103-q105 way: DuckDB has no zlib, so the oracle reads
      // q171's Spark-dumped ratios (__VERIFY_OUT__ fixture) and
      // replays the whole gate — per-source keep/drop rollup — in
      // SQL. Only the deflate byte count itself stays under
      // DeflateRatioSpec's lossless-roundtrip law; everything the
      // ratio DECIDES is now hash-checked. One narrow scan + one
      // source-keyed agg, no extra shuffle
      val dl = graft.functions.Deflate
      t(s, d, "documents")
        .select(col("source"),
          dround(dl.ratio(col("text")), 4).as("ratio"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("ratio") < 0.42, 1L).otherwise(0L))
            .as("n_repetitive"),
          // fixed-point: the 4-decimal ratio ×10⁴ is integral, so the
          // distributed sum is exact and order-free (the q108 lesson —
          // a double sum's 4th decimal is partition-order-dependent)
          sum(round(col("ratio") * 10000, 0).cast("long"))
            .as("sum_ratio_e4"))
        .orderBy(col("source"))
    }),

    // ---- regular-grid time-series resampling ---------------------------
    "q188_resample_locf" -> ((s, d) => {
      // hourly LOCF resample of each user's click-value series: aligned
      // grid from a per-key (min,max) agg + sequence/explode, value via
      // the single-shuffle as-of window (no range-join pair blowup)
      graft.ops.Resample.locf(
          t(s, d, "events").filter(col("event_type") === "click"),
          Seq("user_id"), "ts", "value", stepUs = 3600000000L)
        .orderBy(col("user_id"), col("g_us"))
    }),

    "q190_ewma" -> ((s, d) => {
      // per-user EWMA smoothing of the click-value series: a native
      // DeclarativeAggregate folded sequentially by the window's
      // running frame (bit-reproducible IEEE order; groupBy use raises).
      // Duplicate timestamps collapse by max() first so the fold order
      // is total — same determinism discipline as q188/q189. Nulls are
      // dropped up front: DuckDB's list_reduce fold would NULL-poison
      // where the aggregate's null-carry law keeps state (spec'd at
      // unit level instead)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("t_us"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .select(col("user_id"), col("t_us"),
          dround(graft.functions.Ewma.ewma(col("v"), 0.3).over(w), 4)
            .as("ewma"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q192_image_resize" -> ((s, d) => {
      // bilinear thumbnail resize of the synthetic PNG corpus to a
      // fixed 4x4 RGB tensor (the decode->RESIZE->embed ingestion
      // step), one value per output row so the oracle can replay the
      // EXACT double-arithmetic sampling from the generator's pixel
      // formulas — q161's discipline extended from stats to geometry.
      // Narrow in-row map (pngScan + zero-shuffle sampling); every
      // third asset is noise and must null out, not crash
      val mm = graft.multimodal.MultimodalOps
      val rs = graft.multimodal.ImageResize.column(col("media_bytes"), 4, 4)
      mm.syntheticPngAssets(s, 120)
        .select(col("asset_id"), rs.as("__r"))
        .filter(col("__r").isNotNull)
        .select(col("asset_id"), posexplode(col("__r")))
        .select(col("asset_id"), col("pos").cast("long").as("idx"),
          dround(col("col").cast("double"), 4).as("v"))
        .orderBy(col("asset_id"), col("idx"))
    }),

    "q193_wav_resample" -> ((s, d) => {
      // fixed-length PCM resample of the synthetic audio clips to a
      // 32-sample tensor (q192's sampling law in 1-D): the oracle
      // replays the interpolation from the generator's sample formula.
      // Zero-copy in-row sampling straight off the container bytes
      val mm = graft.multimodal.MultimodalOps
      val rs = graft.multimodal.AudioResample.column(col("media_bytes"), 32)
      mm.syntheticDecodableAssets(s, 120)
        .filter(col("modality") === "audio")
        .select(col("asset_id"), rs.as("__r"))
        .filter(col("__r").isNotNull)
        .select(col("asset_id"), posexplode(col("__r")))
        .select(col("asset_id"), col("pos").cast("long").as("idx"),
          dround(col("col").cast("double"), 4).as("v"))
        .orderBy(col("asset_id"), col("idx"))
    }),

    "q194_holt" -> ((s, d) => {
      // Holt linear-trend smoothing of the click series (level+slope
      // state; level+trend = the one-step forecast a sensor pipeline
      // alarms against) — third ordered-fold aggregate, same window
      // contract and null discipline as q190/q191
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("user_id")).orderBy(col("t_us"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .select(col("user_id"), col("t_us"),
          graft.functions.Holt.holt(col("v"), 0.4, 0.3).over(w).as("h"))
        .select(col("user_id"), col("t_us"),
          // + 0 normalizes IEEE -0.0 (a trend decaying to zero from
          // below rounds to '-0.0' in one engine and '0.0' in the
          // other — hit 1 cell in 19,863 at sf0.1)
          (dround(col("h.level"), 4) + lit(0)).as("level"),
          (dround(col("h.trend"), 4) + lit(0)).as("trend"),
          (dround(col("h.level") + col("h.trend"), 4) + lit(0))
            .as("forecast"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q195_holt_winters" -> ((s, d) => {
      // Holt-Winters additive seasonal smoothing (triple exponential)
      // of the click series: level + trend + a period-6 seasonal cycle
      // (the reference's electricity domain is daily-periodic hourly
      // prices, which plain Holt q194 cannot track). Fourth ordered-
      // fold aggregate, same window contract and null discipline; the
      // seasonal index counts observations, so the q188/q189 grid
      // resample is the companion when wall-clock periodicity is meant
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("user_id")).orderBy(col("t_us"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .select(col("user_id"), col("t_us"),
          graft.functions.HoltWinters
            .holtWinters(col("v"), 0.3, 0.2, 0.4, 6).over(w).as("h"))
        .select(col("user_id"), col("t_us"),
          // + 0 normalizes IEEE -0.0 (q194's one-in-20k cell)
          (dround(col("h.level"), 4) + lit(0)).as("level"),
          (dround(col("h.trend"), 4) + lit(0)).as("trend"),
          (dround(col("h.seasonal"), 4) + lit(0)).as("seasonal"),
          (dround(col("h.forecast"), 4) + lit(0)).as("forecast"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q196_image_ann_ivf" -> ((s, d) => {
      // the multimodal retrieval capstone: decode → bilinear resize
      // (q192's tensors, 4dp-quantized — the indexing contract that
      // makes the fixture replay exact) → IVF image similarity, the
      // way q132 closed text ANN. Deterministic first-8-by-id
      // codebook, 2-probe, exact cosine inside probed cells only; the
      // oracle replays cell assignment, probing, and ranking in SQL
      // from the dumped q192 fixture
      val vecs = graft.multimodal.MultimodalOps
        .imageTensorVectors(s, 120, 4, 4)
      graft.operators.SimilarityOps.ivfTopK(
        vecs, vecs.filter(col("asset_id") < 30), "asset_id", "vec",
        "asset_id", k = 5, cells = 8, nprobe = 2, trainIters = 0)
        .orderBy(col("query_id"), col("rn"))
    }),

    "q198_smoothed_view" -> ((s, d) => {
      // the maintained gold-table composition (q188 LOCF grid resample
      // → q190 EWMA) as a batch query: what TimeSeriesView maintains
      // incrementally from a stream, verified here end-to-end against
      // one oracle (grid ASOF + per-key ordered fold). 6-hour grid —
      // the smoothing grain a dashboard stores, and it keeps the
      // oracle's O(n²) slice-fold tractable at sf0.1
      graft.ops.TimeSeriesView.smoothedBatch(
          t(s, d, "events").filter(col("event_type") === "click"),
          Seq("user_id"), "ts", "value", stepUs = 21600000000L,
          alpha = 0.3)
        .select(col("user_id"), col("g_us"),
          dround(col("value"), 4).as("value"),
          dround(col("ewma"), 4).as("ewma"))
        .orderBy(col("user_id"), col("g_us"))
    }),

    "q199_seasonal_decompose" -> ((s, d) => {
      // classical additive decomposition of the click series (period-6
      // centered 2×m MA trend, zero-centered per-slot seasonal,
      // residual): the two-sided EXPLANATION of a finished series,
      // complementing the forward ordered-fold smoothers q190/q194/
      // q195. All distributed sums are integer (1e-4 quantization on
      // entry), so the oracle replays the arithmetic hash-exactly
      graft.ops.Decompose.additive(
          t(s, d, "events").filter(col("event_type") === "click"),
          Seq("user_id"), "ts", "value", period = 6)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          dround(col("v"), 4).as("v"), col("slot"),
          (dround(col("trend"), 4) + lit(0)).as("trend"),
          (dround(col("seasonal"), 4) + lit(0)).as("seasonal"),
          (dround(col("resid"), 4) + lit(0)).as("resid"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q200_ewvar" -> ((s, d) => {
      // exponentially-weighted mean AND variance of the click series
      // (West's one-pass update): the (μ, σ²) state a streaming
      // z-score detector thresholds against — fifth ordered-fold
      // aggregate, same window contract and null discipline as q190.
      // α=0.25 so both α and 1−α are exactly representable doubles
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("user_id")).orderBy(col("t_us"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .select(col("user_id"), col("t_us"),
          graft.functions.EwVar.ewvar(col("v"), 0.25).over(w).as("e"))
        .select(col("user_id"), col("t_us"),
          (dround(col("e.mean"), 4) + lit(0)).as("ew_mean"),
          (dround(col("e.var"), 4) + lit(0)).as("ew_var"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q201_ew_anomaly" -> ((s, d) => {
      // z-score anomaly flags from the EW state: each point is tested
      // against the PRIOR (μ, σ²) — lag(1) of the q200 fold — so the
      // tested observation never absorbs itself before the test.
      // |z| > 3 with a positive prior variance flags the point; the
      // first point and zero-variance warmups read false, never null
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("user_id")).orderBy(col("t_us"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val wo = W.partitionBy(col("user_id")).orderBy(col("t_us"))
      val z = (col("v") - col("pm")) / sqrt(col("pv"))
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .select(col("user_id"), col("t_us"), col("v"),
          graft.functions.EwVar.ewvar(col("v"), 0.25).over(w).as("e"))
        .select(col("user_id"), col("t_us"), col("v"),
          lag(col("e.mean"), 1).over(wo).as("pm"),
          lag(col("e.var"), 1).over(wo).as("pv"))
        .select(col("user_id"), col("t_us"), dround(col("v"), 4).as("v"),
          (dround(when(col("pv") > 0, z), 4) + lit(0)).as("zscore"),
          coalesce(when(col("pv") > 0, abs(z) > 3), lit(false))
            .as("anomaly"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q202_mad_outliers" -> ((s, d) => {
      // robust per-key outlier flags: |v − median| > 3 × MAD over each
      // user's click series — the whole-series robust complement to
      // q201's forward EW z-score. Exact medians over integer-scaled
      // values keep every intermediate an exact binary fraction, so
      // the flag comparison replays bit-for-bit in the oracle
      graft.ops.RobustStats.madOutliers(
          t(s, d, "events").filter(col("event_type") === "click"),
          Seq("user_id"), "ts", "value", k = 3.0)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          dround(col("v"), 4).as("v"),
          dround(col("med"), 4).as("med"),
          dround(col("mad"), 4).as("mad"), col("outlier"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q203_seasonal_outliers" -> ((s, d) => {
      // seasonally-adjusted robust outliers: q199's decomposition
      // removes trend + seasonal, q202's MAD thresholds the RESIDUAL —
      // a spike that is merely "the seasonal peak" no longer flags,
      // and a modest value at the seasonal trough now can. Residuals
      // quantize at 1e-4 (they carry full double precision), so the
      // MAD chain stays on exact binary fractions
      val dec = graft.ops.Decompose.additive(
          t(s, d, "events").filter(col("event_type") === "click"),
          Seq("user_id"), "ts", "value", period = 6)
        .filter(col("resid").isNotNull)
      graft.ops.RobustStats.madOutliers(
          dec, Seq("user_id"), "ts", "resid", k = 3.0, scale = 10000)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          (dround(col("v"), 4) + lit(0)).as("resid"),
          (dround(col("med"), 4) + lit(0)).as("med"),
          dround(col("mad"), 4).as("mad"), col("outlier"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q204_forecast_backtest" -> ((s, d) => {
      // one-step-ahead forecast backtest: Holt's level+trend at t−1
      // vs the naive carry-forward, scored as per-user MAE — the
      // ship/no-ship table for the smoothing family (q156's A/B
      // discipline applied to forecasting). Absolute errors quantize
      // at 1e-4 and sum as longs, so the distributed aggregation is
      // exact and the winner column can compare INTEGERS, never two
      // float sums a partition order could flip
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("user_id")).orderBy(col("t_us"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val wo = W.partitionBy(col("user_id")).orderBy(col("t_us"))
      def aeE4(fc: org.apache.spark.sql.Column) =
        sum(round(abs(col("v") - fc) * lit(10000), 0).cast("long"))
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .select(col("user_id"), col("t_us"), col("v"),
          graft.functions.Holt.holt(col("v"), 0.4, 0.3).over(w).as("h"))
        .select(col("user_id"), col("t_us"), col("v"),
          lag(col("h.level") + col("h.trend"), 1).over(wo).as("fc_holt"),
          lag(col("v"), 1).over(wo).as("fc_naive"))
        .filter(col("fc_holt").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          aeE4(col("fc_holt")).as("__ah"),
          aeE4(col("fc_naive")).as("__an"))
        .select(col("user_id"), col("n"),
          dround(col("__ah").cast("double") / col("n") / lit(10000.0), 4)
            .as("mae_holt"),
          dround(col("__an").cast("double") / col("n") / lit(10000.0), 4)
            .as("mae_naive"),
          when(col("__ah") < col("__an"), "holt")
            .when(col("__ah") > col("__an"), "naive")
            .otherwise("tie").as("winner"))
        .orderBy(col("user_id"))
    }),

    "q205_ohlc_bars" -> ((s, d) => {
      // OHLC downsampling bars: 6-hour buckets per user with open =
      // earliest, close = latest, high/low extremes and count — the
      // lossy-but-shaped aggregation a dashboard stores when the LOCF
      // grid (q188) is too fine. Duplicate timestamps collapse first
      // so min_by/max_by never tie; one shuffle at (key, bucket) grain
      val bucketUs = 21600000000L
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .withColumn("bucket_us",
          col("t_us") - ((col("t_us") % bucketUs + bucketUs) % bucketUs))
        .groupBy(col("user_id"), col("bucket_us"))
        .agg(count(lit(1)).as("n"),
          dround(min_by(col("v"), col("t_us")), 4).as("open"),
          dround(max(col("v")), 4).as("high"),
          dround(min(col("v")), 4).as("low"),
          dround(max_by(col("v"), col("t_us")), 4).as("close"))
        .orderBy(col("user_id"), col("bucket_us"))
    }),

    "q206_rolling_autocorr" -> ((s, d) => {
      // rolling lag-1 autocorrelation over a 12-observation window:
      // the persistence diagnostic that tells a forecaster whether
      // q190's smoothing or q194's trend model is even applicable.
      // All five Pearson components are window sums of LONGS (values
      // quantized e2 — exact, the inputs carry 2 decimals), so the
      // only floating-point ops are the final sqrt/divide on identical
      // operands — partition-independent and oracle-replayable
      val W = org.apache.spark.sql.expressions.Window
      val wo = W.partitionBy(col("user_id")).orderBy(col("t_us"))
      val wf = wo.rowsBetween(-11, 0)
      val x = col("__xe")
      val y = col("__ye")
      val n = count(lit(1)).over(wf)
      val num = (lit(12) * sum(x * y).over(wf)
        - sum(x).over(wf) * sum(y).over(wf)).cast("double")
      val dx = (lit(12) * sum(x * x).over(wf)
        - sum(x).over(wf) * sum(x).over(wf)).cast("double")
      val dy = (lit(12) * sum(y * y).over(wf)
        - sum(y).over(wf) * sum(y).over(wf)).cast("double")
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .withColumn("__xe", round(col("v") * lit(100), 0).cast("long"))
        .withColumn("__ye", lag(col("__xe"), 1).over(wo))
        .filter(col("__ye").isNotNull)
        .withColumn("ac1",
          when(n === 12 && dx > 0 && dy > 0,
            num / (sqrt(dx) * sqrt(dy))))
        .filter(col("ac1").isNotNull)
        .select(col("user_id"), col("t_us"),
          (dround(col("ac1"), 4) + lit(0)).as("ac1"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q207_kalman" -> ((s, d) => {
      // local-level Kalman filtering of the click series: where q190's
      // EWMA blends with a FIXED gain, the Kalman gain adapts to the
      // estimate's own uncertainty (high after the seed, converging to
      // the steady Q/R blend) — sixth ordered-fold aggregate, same
      // window contract and null discipline. Q=0.25, R=4 are exactly
      // representable so the oracle literals are bit-identical
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("user_id")).orderBy(col("t_us"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .select(col("user_id"), col("t_us"),
          graft.functions.Kalman.kalman(col("v"), 0.25, 4.0).over(w)
            .as("k"))
        .select(col("user_id"), col("t_us"),
          (dround(col("k.estimate"), 4) + lit(0)).as("estimate"),
          dround(col("k.variance"), 4).as("variance"),
          dround(col("k.gain"), 4).as("gain"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q191_cusum" -> ((s, d) => {
      // two-sided CUSUM drift alarms on each user's click-value series
      // vs a known target (mu=100, slack=10, threshold 150): both
      // one-sided statistics fold sequentially in the running frame
      // (native DeclarativeAggregate, 2-double buffer). Null values
      // are dropped up front so the recursive-CTE oracle replays the
      // same series (the aggregate's null-carry law is unit-spec'd)
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("user_id")).orderBy(col("t_us"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .select(col("user_id"), col("t_us"),
          graft.functions.Cusum.cusum(col("v"), 100.0, 10.0).over(w)
            .as("c"))
        .select(col("user_id"), col("t_us"),
          dround(col("c.s_pos"), 4).as("s_pos"),
          dround(col("c.s_neg"), 4).as("s_neg"),
          (col("c.s_pos") > 150.0 || col("c.s_neg") > 150.0).as("alarm"))
        .orderBy(col("user_id"), col("t_us"))
    }),

    "q189_resample_linear" -> ((s, d) => {
      // same grid, linear interpolation between the neighbouring
      // observations — both neighbours from ONE window pass over the
      // unioned (observation ∪ grid) timeline, not two as-of joins
      graft.ops.Resample.linear(
          t(s, d, "events").filter(col("event_type") === "click"),
          Seq("user_id"), "ts", "value", stepUs = 3600000000L)
        .select(col("user_id"), col("g_us"), dround(col("value"), 4).as("value"))
        .orderBy(col("user_id"), col("g_us"))
    }),

    // ---- line-level boilerplate removal -------------------------------
    "q172_boilerplate" -> ((s, d) => {
      // jusText-lite over closed-form fixture pages (corpus docs are
      // single-line): per-line token count + stopword density decide
      // keep/drop; the oracle rebuilds the exact pages AND the exact
      // cleaned text (md5-compared), so a single misclassified line
      // breaks the match. Pure codegen'd column lambdas, no shuffle
      graft.ops.Boilerplate.clean(
          graft.ops.Boilerplate.syntheticPages(s, 110), "text")
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("clean_text").cast("binary")).as("clean_md5"))
        .orderBy(col("doc_id"))
    }),

    // ---- right-to-be-forgotten deletion propagation -------------------
    "q173_bm25_forget" -> ((s, d) => {
      // takedown propagation through the retrieval index: publish on
      // the full corpus, FORGET every doc_id ≡ 3 (mod 10)
      // (merge-on-read tombstones + df/stats subtraction, postings
      // never rewritten), then search. The oracle is BM25 REBUILT on
      // the remaining corpus: deletion must be score-for-score
      // indistinguishable from never having indexed the docs
      val docs = t(s, d, "documents")
      val path = s"${graft.core.Scratch.root(docs)}/bm25fgt_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(path)
      graft.operators.Bm25Index.publish(docs, "doc_id", "text", path)
      graft.operators.Bm25Index.forget(s, path,
        docs.filter(pmod(col("doc_id"), lit(10)) === 3)
          .select(col("doc_id")),
        "doc_id", opId = 1L)
      import s.implicits._
      val qs = Seq(
        (0L, "hash join table"),
        (1L, "window agg scan"),
        (2L, "fast merge batch")).toDF("query_id", "qtext")
      graft.operators.Bm25Index.searchFrom(
        s, path, qs, "query_id", "qtext", "doc_id", k = 5)
    }),

    // ---- dense-side takedown (IVF tombstones) -------------------------
    "q174_ivf_forget" -> ((s, d) => {
      // the dense twin of q173: publish the IVF index on the full
      // corpus, tombstone every vec_id ≡ 2 (mod 7), search external
      // probes. Cosine has no corpus statistics, so deletion is pure
      // anti-join — the oracle assigns ALL vectors to the full-corpus
      // codebook and filters the forgotten ones, which must equal
      // never having admitted them
      val emb = t(s, d, "embeddings")
      val path = s"${graft.core.Scratch.root(emb)}/ivffgt_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(path)
      graft.operators.IvfIndex.publish(emb, "vec_id", "embedding", path)
      graft.operators.IvfIndex.forget(s, path,
        emb.filter(pmod(col("vec_id"), lit(7)) === 2)
          .select(col("vec_id")), "vec_id")
      graft.operators.IvfIndex.searchFrom(
          s, path, emb.filter(col("vec_id") < 10), "vec_id",
          "embedding", "vec_id", k = 5, nprobe = 4)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- takedown compliance audit ------------------------------------
    "q175_takedown_audit" -> ((s, d) => {
      // the release gate after a right-to-be-forgotten run: build the
      // full doc_id-keyed stack (base table, BM25 index, IVF index
      // over the hashed dense vectors), take down every doc_id ≡ 3
      // (mod 10) in ONE Takedown call, then audit BOTH probes — the
      // deleted set must be unreachable on every surface (0 leaks)
      // and a control set must still be fully reachable (the audit
      // itself is proven live, not vacuously zero)
      val docs = t(s, d, "documents")
      val root = s"${graft.core.Scratch.root(docs)}/takedown_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (base, bm, ivf) = (s"$root/base", s"$root/bm25", s"$root/ivf")
      // the three surfaces are independent builds over the same corpus
      // (distinct table roots) — overlap them (guide §2.6)
      graft.core.Par.run[Unit](Seq(
        () => { graft.core.VersionedTable.commitAppend(docs, base); () },
        () => {
          graft.operators.Bm25Index.publish(docs, "doc_id", "text", bm)
          ()
        },
        () => {
          graft.operators.IvfIndex.publish(
            graft.operators.HashingVectorizer.denseVectors(
              docs, "doc_id", "text", dim = 64),
            "doc_id", "vec", ivf)
          ()
        }
      ))
      val deleted = docs.filter(pmod(col("doc_id"), lit(10)) === 3)
        .select(col("doc_id"))
      val control = docs.filter(pmod(col("doc_id"), lit(10)) === 4)
        .select(col("doc_id"))
      graft.ops.Takedown.forget(s, deleted, "doc_id", opId = 1L,
        basePath = Some(base), bm25Path = Some(bm), ivfPath = Some(ivf))
      graft.ops.Takedown.audit(s, deleted, "doc_id",
          Some(base), Some(bm), Some(ivf))
        .withColumn("probe", lit("deleted"))
        .unionByName(graft.ops.Takedown.audit(s, control, "doc_id",
            Some(base), Some(bm), Some(ivf))
          .withColumn("probe", lit("control")))
        .select(col("probe"), col("surface"), col("n_leaked"))
        .orderBy(col("probe"), col("surface"))
    }),

    "q179_erasure_audit" -> ((s, d) => {
      // the BYTE-level completion of q175's reachability gate: after
      // forget (merge-on-read tombstones + copy-on-write base delete),
      // Takedown.erase purges the tombstones out of the index tables
      // and vacuums EVERY surface to its live version — then
      // auditBytes walks the raw parquet files physically on disk
      // (manifest-referenced or not) and reports stray files (0),
      // raw rows still carrying the forgotten ids (0), and the
      // distinct surviving ids (the oracle replays that surviving
      // content from the corpus). graceMs=0 is safe: no concurrent
      // writer exists inside one catalog query
      val docs = t(s, d, "documents")
      val root = s"${graft.core.Scratch.root(docs)}/erasure_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (base, bm) = (s"$root/base", s"$root/bm25")
      // two independent surface builds (distinct roots) — overlap
      graft.core.Par.run[Unit](Seq(
        () => { graft.core.VersionedTable.commitAppend(docs, base); () },
        () => {
          graft.operators.Bm25Index.publish(docs, "doc_id", "text", bm)
          ()
        }
      ))
      val deleted = docs.filter(pmod(col("doc_id"), lit(10)) === 3)
        .select(col("doc_id"))
      graft.ops.Takedown.forget(s, deleted, "doc_id", opId = 1L,
        basePath = Some(base), bm25Path = Some(bm))
      graft.ops.Takedown.erase(s, opId = 2L, basePath = Some(base),
        bm25Path = Some(bm), graceMs = 0L)
      graft.ops.Takedown.auditBytes(s, deleted, "doc_id",
          basePath = Some(base), bm25Path = Some(bm))
        .select(col("surface"), col("n_stray_files"),
          col("n_raw_hits"), col("n_live_docs"))
        .orderBy(col("surface"))
    }),

    // ---- unigram-LM tokenizer (SentencePiece family) ------------------
    "q176_unigram_vocab" -> ((s, d) => {
      // the scored piece vocabulary: top-40 substrings by weighted
      // count + single-char closure, scores = round(ln(cnt/total)·1e6)
      // as BIGINT — computed in Spark SQL so HALF_UP rounding matches
      // DuckDB's round; the oracle re-derives the whole selection
      graft.operators.Unigram.pieceVocab(
          t(s, d, "documents"), "text", vocabSize = 40,
          maxPieceLen = 4)
        .orderBy(col("piece"))
    }),

    "q177_unigram_encode" -> ((s, d) => {
      // Viterbi corpus encode under the trained vocab: per doc the
      // word count, optimal piece count, and scaled-int log-prob.
      // Each DISTINCT word segments once through the codegen'd
      // integer DP; the oracle enumerates ALL segmentations per word
      // recursively and takes the identical BIGINT max — a single
      // differing piece choice anywhere breaks the hash
      graft.operators.Unigram.encode(
          t(s, d, "documents"), "doc_id", "text", vocabSize = 40,
          maxPieceLen = 4)
        .orderBy(col("doc_id"))
    }),

    "q182_unigram_em" -> ((s, d) => {
      // one hard-EM (Viterbi re-estimation) refinement of the unigram
      // vocab: canonical segmentation per distinct word (max objective,
      // lex-smallest piece array on ties) -> frequency-weighted piece
      // usage -> prune unused multi-char pieces, floor single chars at
      // 1, re-score over the refined set. The oracle enumerates every
      // segmentation recursively, replays the identical canonical
      // tie-break via ORDER BY val DESC, piece_list ASC, and re-derives
      // the full M-step — any drift in the DP, the tie-break, or the
      // re-scoring breaks the hash
      graft.operators.Unigram.pieceVocabEm(
          t(s, d, "documents"), "text", vocabSize = 40,
          maxPieceLen = 4)
        .orderBy(col("piece"))
    }),

    "q186_replace_where" -> ((s, d) => {
      // the backfill shape: a corrected feed re-lands exactly one
      // priority window of a versioned fact table via REPLACE WHERE —
      // file-granular copy-on-write (files without a matching row
      // carry by reference; the spec pins that claim). The corrected
      // rows double each price exactly in cents; the oracle derives
      // the post-backfill rollup from the raw table, so replacing too
      // much, too little, or losing untouched rows breaks the hash
      val orders = t(s, d, "orders")
      val root = s"${graft.core.Scratch.root(orders)}/rpw_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val fact = s"$root/fact"
      (0 until 3).foreach(i => graft.core.VersionedTable.commitAppend(
        orders.filter(col("o_orderkey") % 3 === i), fact))
      val window = col("o_orderpriority") === "1-URGENT"
      val corrected = graft.core.VersionedTable.read(s, fact)
        .filter(window)
        .withColumn("o_totalprice",
          round(col("o_totalprice") * 100, 0) * 2 / lit(100.0))
      graft.core.VersionedTable.commitReplaceWhere(s, fact, corrected,
        window)
      graft.core.VersionedTable.read(s, fact)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("sum_cents"))
        .orderBy(col("o_orderpriority"))
    }),

    "q185_incremental_join_agg" -> ((s, d) => {
      // enrichment-rollup materialized view: revenue per customer
      // nation, maintained across fact appends WITHOUT rescanning the
      // fact table. Half the orders commit, the view initializes; the
      // other half appends, the view delta-merges (the emitted `mode`
      // column pins that the incremental path ran — a fallback to
      // recompute breaks the hash). The oracle derives the rollup from
      // the raw join, so any drift in the delta join/merge breaks too
      val orders = t(s, d, "orders").withColumn("oop",
        round(col("o_totalprice") * 100, 0).cast("long"))
      val dim = t(s, d, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
      val root = s"${graft.core.Scratch.root(orders)}/joinagg_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (fact, dimP, agg) = (s"$root/fact", s"$root/dim", s"$root/agg")
      graft.core.VersionedTable.commitAppend(dim, dimP)
      graft.core.VersionedTable.commitAppend(
        orders.filter(col("o_orderkey") % 2 === 0), fact)
      graft.ops.IncrementalAgg.maintainJoined(s, fact, dimP, agg,
        "o_custkey", Seq("c_nationkey"), "oop")
      graft.core.VersionedTable.commitAppend(
        orders.filter(col("o_orderkey") % 2 =!= 0), fact)
      val r = graft.ops.IncrementalAgg.maintainJoined(s, fact, dimP,
        agg, "o_custkey", Seq("c_nationkey"), "oop")
      graft.ops.IncrementalAgg.read(s, agg)
        .select(lit(r.mode).as("mode"), col("c_nationkey"),
          col("n_rows"), col("sum_val"))
        .orderBy(col("c_nationkey"))
    }),

    "q197_dim_delta_view" -> ((s, d) => {
      // slowly-changing-dim maintenance: the q185 rollup kept current
      // through a DIM UPDATE without the full recompute — customers
      // with custkey % 100 == 0 migrate to the next nation, and the
      // repair rebuilds only the groups reachable from those keys
      // (subtract old-dim contribution, add new-dim, additive integer
      // algebra). The emitted `mode` pins that the cheap path ran; the
      // oracle derives the rollup from the raw join under the UPDATED
      // dim, so a wrong repair breaks the hash
      val orders = t(s, d, "orders").withColumn("oop",
        round(col("o_totalprice") * 100, 0).cast("long"))
      val dim = t(s, d, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
      val root = s"${graft.core.Scratch.root(orders)}/dimdelta_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (fact, dimP, agg) = (s"$root/fact", s"$root/dim", s"$root/agg")
      // two independent table builds (distinct roots) — overlap
      graft.core.Par.run[Int](Seq(
        () => graft.core.VersionedTable.commitAppend(dim, dimP),
        () => graft.core.VersionedTable.commitAppend(orders, fact)))
      graft.ops.IncrementalAgg.maintainJoined(s, fact, dimP, agg,
        "o_custkey", Seq("c_nationkey"), "oop")
      graft.core.VersionedTable.commitOverwrite(
        dim.withColumn("c_nationkey",
          when(col("o_custkey") % 100 === 0,
            (col("c_nationkey") + 1) % 25)
            .otherwise(col("c_nationkey"))), dimP)
      val r = graft.ops.IncrementalAgg.maintainJoined(s, fact, dimP,
        agg, "o_custkey", Seq("c_nationkey"), "oop")
      graft.ops.IncrementalAgg.read(s, agg)
        .select(lit(r.mode).as("mode"), col("c_nationkey"),
          col("n_rows"), col("sum_val"))
        .orderBy(col("c_nationkey"))
    }),

    // ---- interchange-format ingestion (JSONL / ORC) -------------------
    "q183_jsonl_roundtrip" -> ((s, d) => {
      // JSONL is THE LLM-corpus interchange format: export the corpus
      // as JSONL shards, re-ingest under an EXPLICIT schema (never
      // inference — that's a full extra pass at 100 TB) with
      // corrupt-record quarantine, and prove byte-exact fidelity of
      // free text (newlines, quotes, unicode escapes) against the
      // oracle's direct parquet read
      val docs = t(s, d, "documents")
      val root = s"${graft.core.Scratch.root(docs)}/jsonl_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      graft.sources.TextFormats.writeJsonLines(docs, root)
      val parsed = graft.sources.TextFormats.readJsonLines(
        s, root, docs.schema)
      graft.sources.TextFormats.goodRecords(parsed)
        .select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "q184_orc_roundtrip" -> ((s, d) => {
      // the other columnar lake format a migrating user brings: ORC
      // round-trip with a pushdown-able predicate on the re-read (the
      // plan spec asserts the filter reaches the ORC scan)
      val docs = t(s, d, "documents")
      val root = s"${graft.core.Scratch.root(docs)}/orc_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      graft.sources.TextFormats.writeOrc(docs, root)
      graft.sources.TextFormats.readOrc(s, root)
        .filter(col("n_chars") >= 200L)
        .select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ---- zero-copy experiment branch (shallow clone) ------------------
    "q178_clone_branch" -> ((s, d) => {
      // the dev-fork loop: shallow-clone the corpus table (metadata
      // only — no bytes copied), run a curation experiment on the
      // BRANCH (delete every doc_id ≡ 1 (mod 7)), and report both
      // branches side by side. The oracle derives each branch from
      // the raw corpus, so a clone that shared ANY state with its
      // source after the fork (or copied the wrong version) breaks
      val docs = t(s, d, "documents")
      val root = s"${graft.core.Scratch.root(docs)}/clone_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (src, branch) = (s"$root/src", s"$root/branch")
      graft.core.VersionedTable.commitAppend(docs, src)
      graft.core.VersionedTable.cloneFrom(s, src, branch)
      graft.core.VersionedTable.commitDelete(s, branch,
        docs.filter(pmod(col("doc_id"), lit(7)) === 1)
          .select(col("doc_id")), Seq("doc_id"))
      def stats(path: String, name: String) =
        graft.core.VersionedTable.read(s, path)
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"))
          .select(lit(name).as("branch"), col("n_docs"),
            col("sum_chars"))
      stats(src, "source").unionByName(stats(branch, "experiment"))
        .orderBy(col("branch"))
    }),

    // ---- entity canonicalization (full ER loop) -----------------------
    "q166_entity_resolve" -> ((s, d) => {
      // block -> Jaro-Winkler score -> connected components ->
      // canonical surface form (highest support, ties to the smaller
      // string): the step after q164 that downstream pipelines
      // actually consume (rewrite the attribute to `canonical`). The
      // oracle replays the closure with a recursive min-label
      // propagation over the same scored pairs
      graft.ops.FuzzyLink.resolveEntities(
        t(s, d, "part"), "p_name", minSim = 0.9)
    }),

    // ---- k-anonymity / l-diversity release gate -----------------------
    "q165_k_anonymity" -> ((s, d) => {
      // privacy audit before publishing a user-adjacent table
      // (Sweeney 2002; Machanavajjhala 2007): per (nation, segment)
      // quasi-identifier class, its size, the k>=10 anonymity flag,
      // and the number of distinct sensitive values (account-balance
      // thousand-bucket) for the homogeneity check. One map-side
      // aggregation; classes are vocabulary-sized
      graft.ops.Anonymity.classAudit(
          t(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"),
          k = 10,
          sensitive = floor(col("c_acctbal") / 1000).cast("long"))
        .select(col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_mktsegment"),
          col("class_size"), col("anonymous"), col("l_distinct"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),

    // ---- Jaro-Winkler fuzzy linkage -----------------------------------
    "q164_jaro_link" -> ((s, d) => {
      // q138's blocked entity resolution with the Jaro-Winkler scorer
      // (Spark has levenshtein but no Jaro builtin; the codegen'd
      // expression implements the exact textbook semantics DuckDB's
      // jaro_winkler_similarity does — integer transposition halving,
      // 0.7 boost threshold, prefix cap 4, empty->0 — fuzz-verified
      // at 1e-12 over random pairs). Same vocabulary-sized blocking:
      // the all-pairs frame never forms
      graft.ops.FuzzyLink.selfLinkJaro(
        t(s, d, "part"), "p_name", minSim = 0.9)
    }),

    // ---- Unicode NFC canonicalization ---------------------------------
    "q163_nfc_normalize" -> ((s, d) => {
      // canonical composition before hashing: precomposed é and
      // e+COMBINING ACUTE are the same visible text but different
      // bytes — without NFC they hash into different dedup clusters.
      // The codegen'd NfcNormalize (JDK Normalizer) is cross-checked
      // against DuckDB's utf8proc nfc_normalize: the oracle rebuilds
      // the raw mixed-normalization strings with chr() and compares
      // codepoint counts before/after plus an md5 of the normalized
      // text. Narrow in-row map, no shuffle before the ordering.
      val tn = graft.functions.TextNormalize
      tn.syntheticUnicodeDocs(s, 90)
        .select(col("doc_id"), col("text"),
          tn.column(col("text")).as("norm"))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_raw"),
          length(col("norm")).cast("long").as("n_norm"),
          md5(col("norm").cast("binary")).as("norm_md5"))
        .orderBy(col("doc_id"))
    }),

    // ---- hashing-trick TF-IDF document vectors ------------------------
    "q129_hashed_tfidf" -> ((s, d) => {
      // fixed-dim lexical vectors without an embedding model
      // (Weinberger 2009): md5-bucketed, scaled-integer aggregation
      // (no float sum crosses a shuffle), L2-normalized at the surface
      graft.operators.HashingVectorizer.hashedTfIdf(
        t(s, d, "documents"), "doc_id", "text", dim = 64)
        .orderBy(col("doc_id"), col("bucket"))
    }),

    // ---- text ANN over hashed vectors ---------------------------------
    "q130_text_ann" -> ((s, d) => {
      // brute-force cosine top-5 for the first 10 docs against the
      // corpus on q129's vectors — the text twin of q28; the cosine
      // numerator is an exact integer sum, so Spark and the oracle
      // agree bit-for-bit including rank ties
      graft.operators.HashingVectorizer.textTopK(
        t(s, d, "documents"), "doc_id", "text",
        q => q < 10, k = 5, dim = 64)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- text ANN, the SCALE path: hashed vectors → IVF ---------------
    "q132_text_ann_ivf" -> ((s, d) => {
      // what a 100-TB user actually runs for text similarity: q129's
      // hashed dense vectors bridged onto the IVF stack — coarse cells
      // from the deterministic first-16-by-id codebook, queries probe
      // their 4 nearest cells, exact cosine inside probed cells only.
      // q130's queries×corpus frame never forms; each query touches
      // ~nprobe/cells of the corpus. denseVectors is itself a
      // materialized session artifact (codebook init + corpus assign
      // + query probe all read the same dense table)
      val dv = graft.operators.HashingVectorizer.denseVectors(
        t(s, d, "documents"), "doc_id", "text", dim = 64)
      graft.operators.SimilarityOps.ivfTopK(
        dv, dv.filter(col("doc_id") < 10), "doc_id", "vec",
        "doc_id", k = 5, cells = 16, nprobe = 4, trainIters = 0)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- BM25 lexical top-k retrieval ---------------------------------
    "q135_bm25" -> ((s, d) => {
      // the sparse-retrieval half of a hybrid RAG stack: Okapi BM25
      // (Lucene idf) top-5 per query. Query terms broadcast onto the
      // postings (tf) table, so only docs sharing a term are scored;
      // per-term contributions are 1e-6-scaled integers before the
      // per-(query, doc) sum — no float addition crosses an exchange
      import s.implicits._
      val qs = Seq(
        (0L, "hash join table"),
        (1L, "window agg scan"),
        (2L, "fast merge batch")).toDF("query_id", "qtext")
      graft.operators.Bm25.topK(
        t(s, d, "documents"), "doc_id", "text",
        qs, "query_id", "qtext", k = 5)
    }),

    // ---- hard-negative mining for retrieval training ------------------
    "q141_hard_negatives" -> ((s, d) => {
      // DPR-style BM25 hard negatives: queries are the first 8 tokens
      // of docs 0-2 (the source doc is the known positive); candidates
      // that ARE the positive or near-duplicates of it are excluded —
      // they would be false negatives in contrastive training
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            TextFunctions.tokens(lower(col("text"))), 1, 8)).as("qtext"),
          col("doc_id").as("pos_id"))
      val cl = graft.operators.DedupClusters.clusterMap(
        docs, "doc_id", "text", threshold = 0.95)
      graft.operators.HardNegatives.mine(docs, "doc_id", "text",
        qs, "query_id", "qtext", "pos_id", cl,
        n = 5, candidateK = 20)
    }),

    // ---- syndication-graph source ranking -----------------------------
    "q145_syndication_rank" -> ((s, d) => {
      // mirror-site detection: sources whose documents near-duplicate
      // each other's form a syndication graph (edge weight = cross-
      // source near-dup pair count); PageRank centrality flags the
      // sources most entangled in copying — a downweight signal in
      // crawl curation. Composes the cached near-dup pair artifact
      // with the PageRank operator
      val docs = t(s, d, "documents")
      val pairs = graft.operators.DedupOps.minhashNearDups(
        docs, "doc_id", "text", threshold = 0.95)
      val srcOf = (side: String, out: String) => docs.select(
        col("doc_id").as(side), col("source").as(out))
      val und = pairs
        .join(srcOf("id_a", "src_a"), "id_a")
        .join(srcOf("id_b", "src_b"), "id_b")
        .filter(col("src_a") =!= col("src_b"))
        .select(least(col("src_a"), col("src_b")).as("a"),
          greatest(col("src_a"), col("src_b")).as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
      val sym = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
        .union(und.select(col("b").as("src"), col("a").as("dst"), col("w")))
      graft.ops.PageRank.run(sym, "src", "dst", "w", iters = 3)
        .orderBy(col("node"))
    }),

    // ---- distribution-drift monitor (PSI) -----------------------------
    "q144_psi_drift" -> ((s, d) => {
      // Population Stability Index of the event-value distribution,
      // reference (even event ids) vs current (odd): per-bucket terms
      // scaled to integers before the sum, so the oracle matches
      // bit-for-bit; psi > 0.25 is the classic retrain threshold
      val ev = t(s, d, "events")
      graft.ops.DriftMonitor.psi(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        ev.filter(pmod(col("event_id"), lit(2)) === 1),
        "value", edges = Seq(10.0, 25.0, 50.0, 100.0, 200.0))
    }),

    // ---- incremental IVF index maintenance ----------------------------
    "q143_ivf_incremental" -> ((s, d) => {
      // the FAISS train-then-add discipline as a lake artifact:
      // publish codebook + assignments on the 80% slice, admit the
      // rest against the FROZEN codebook (narrow map + append), then
      // search the persisted index. The oracle replays the old-slice
      // codebook over the FULL corpus — admission must equal rebuild
      val emb = t(s, d, "embeddings")
      val path = s"${graft.core.Scratch.root(emb)}/ivfidx_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(path)
      val old = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val batch = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      graft.operators.IvfIndex.publish(
        old, "vec_id", "embedding", path)
      graft.operators.IvfIndex.update(
        batch, "vec_id", "embedding", path)
      graft.operators.IvfIndex.searchFrom(
        s, path, emb.filter(col("vec_id") < 10), "vec_id",
        "embedding", "vec_id", k = 5, nprobe = 4)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- retrieval evaluation metrics (MRR / hit@k) -------------------
    "q142_retrieval_metrics" -> ((s, d) => {
      // the eval half of the retrieval stack: rank of each query's
      // known positive in the BM25 top-20, reciprocal rank, hit@5 —
      // per-query rows so rr=0 rows ARE the error analysis
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            TextFunctions.tokens(lower(col("text"))), 1, 8)).as("qtext"),
          col("doc_id").as("pos_id"))
      val res = graft.operators.Bm25.topK(docs, "doc_id", "text",
        qs, "query_id", "qtext", k = 20)
      graft.operators.RetrievalMetrics.evaluate(
        res, "doc_id", qs, "pos_id", k = 5)
    }),

    // ---- trained language identification (Cavnar–Trenkle) -------------
    "q140_langid_trained" -> ((s, d) => {
      // profiles trained on even doc_ids (labeled), odd docs held out
      // and classified by out-of-place rank distance — all integer
      // ranks/sums, so the oracle matches bit-for-bit
      val docs = t(s, d, "documents")
      val profiles = graft.operators.LangId.trainProfiles(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), "lang", "text")
      graft.operators.LangId.classify(
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", profiles)
        .orderBy(col("doc_id"))
    }),

    // ---- incremental BM25 index maintenance ---------------------------
    "q139_bm25_incremental" -> ((s, d) => {
      // growing-corpus index maintenance: publish the index on the 80%
      // "already ingested" slice, fold the rest in as an arriving
      // batch (only the batch is tokenized; df merges at vocabulary
      // size, postings/doclen append). The oracle is FULL-corpus BM25:
      // incremental admission must equal the recompute exactly
      val docs = t(s, d, "documents")
      val path = s"${graft.core.Scratch.root(docs)}/bm25idx_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(path)
      val old = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      graft.operators.Bm25Index.publish(old, "doc_id", "text", path)
      graft.operators.Bm25Index.update(batch, "doc_id", "text", path)
      import s.implicits._
      val qs = Seq(
        (0L, "hash join table"),
        (1L, "window agg scan"),
        (2L, "fast merge batch")).toDF("query_id", "qtext")
      graft.operators.Bm25Index.searchFrom(
        s, path, qs, "query_id", "qtext", "doc_id", k = 5)
    }),

    // ---- blocked fuzzy record linkage ---------------------------------
    "q138_fuzzy_link" -> ((s, d) => {
      // entity resolution over part names: distinct values first
      // (vocabulary-sized), first+last-token blocking, levenshtein ≤ 4
      // only within blocks — the all-pairs frame never forms
      graft.ops.FuzzyLink.selfLink(
        t(s, d, "part"), "p_name", maxDist = 4)
    }),

    // ---- leakage-safe k-fold cross-validation -------------------------
    "q137_kfold" -> ((s, d) => {
      // 5-fold CV where the fold unit is the near-dup cluster (the
      // q131 leakage argument, k-fold shape): fold is a pure function
      // of (seed, cluster_id), so no near-duplicates straddle folds
      val docs = t(s, d, "documents")
      val cl = graft.operators.DedupClusters.clusterMap(
        docs, "doc_id", "text", threshold = 0.95)
      graft.ops.Splits.kfold(cl, col("cluster_id"),
        seed = "graft", k = 5)
        .select(col("doc_id"), col("cluster_id"), col("fold"))
        .orderBy(col("doc_id"))
    }),

    // ---- PageRank link authority --------------------------------------
    "q136_pagerank" -> ((s, d) => {
      // crawl-curation graph signal: weighted PageRank (3 power
      // iterations, d=0.85) over the part↔supplier co-occurrence
      // graph from lineitem (supplier nodes offset by 1e6 to keep id
      // spaces disjoint). Integer-scaled ranks — the oracle unrolls
      // the identical iterations and matches bit-for-bit
      val pairs = t(s, d, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("w"))
      val fwd = pairs.select(col("l_partkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"), col("w"))
      val rev = pairs.select(
        (col("l_suppkey") + lit(1000000L)).as("src"),
        col("l_partkey").as("dst"), col("w"))
      graft.ops.PageRank.run(fwd.union(rev), "src", "dst", "w",
        iters = 3)
        .orderBy(col("node"))
    }),

    // ---- incremental cluster-map maintenance --------------------------
    "q134_incremental_clusters" -> ((s, d) => {
      // growing-corpus cluster maintenance: publish the map on the
      // 80% "already ingested" slice, then fold the rest in as an
      // arriving batch — signature-store candidates, delta-subgraph
      // closure, relabel-on-merge. The oracle is the FULL-corpus
      // closure: incremental admission must equal the recompute
      val docs = t(s, d, "documents")
      val path = s"${graft.core.Scratch.root(docs)}/incrclusters_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(path)
      val old = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      graft.operators.IncrementalClusters.publish(
        old, "doc_id", "text", path)
      graft.operators.IncrementalClusters.update(
        batch, old, "doc_id", "text", path)
      graft.operators.IncrementalClusters.read(s, path)
        .orderBy(col("doc_id"))
    }),

    // ---- table-driven blocklist ---------------------------------------
    "q133_blocklist_table" -> ((s, d) => {
      // the production compliance shape: the blocklist is a TABLE (here
      // derived in-pipeline — top-20 doc-frequency bigrams), pulled
      // through flagPhrasesFrom's size-guarded collect and shipped
      // inside the Aho–Corasick automaton (broadcast-build shape).
      // Blocklist order is lexicographic, so first_hit = the smallest
      // matched phrase — which is what the oracle's min() re-derives
      val docs = t(s, d, "documents")
      val phrases = docs
        .select(explode(array_distinct(
          graft.functions.WordShingles.column(
            TextFunctions.tokens(lower(col("text"))), 2))).as("phrase"))
        .filter(length(col("phrase")) > 0)
        .groupBy(col("phrase")).agg(count(lit(1)).as("__df"))
        .orderBy(col("__df").desc, col("phrase")).limit(20)
        .select(col("phrase"))
      graft.operators.Blocklist.flagPhrasesFrom(
        docs.withColumn("__lc", lower(col("text"))), "doc_id", "__lc",
        phrases, "phrase")
        .orderBy(col("doc_id"))
    }),

    // ---- leakage-safe train/val/test split ----------------------------
    "q131_leakage_safe_split" -> ((s, d) => {
      // the split unit is the near-dup cluster: a val doc whose
      // near-duplicate sits in train is memorizable eval leakage, so
      // every member inherits the split hashed from the cluster id
      graft.ops.Splits.leakageSafe(
        t(s, d, "documents"), "doc_id", "text", seed = "graft")
        .orderBy(col("doc_id"))
    }),

    // ---- keep-best-quality cluster representative ---------------------
    "q113_cluster_best" -> ((s, d) => {
      // near-dup clusters (q59's pair graph) ranked by quality score:
      // the curation decision keeps the argmax member, not the min id.
      // Consumes the shared cluster-map artifact (see q59)
      val docs = t(s, d, "documents")
      val cl = graft.operators.DedupClusters.clusterMap(
        docs, "doc_id", "text", threshold = 0.95)
      val scored = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text"))
          .as("quality"))
      graft.operators.DedupClusters.bestRepresentativesFrom(
        scored, "doc_id", cl)
        .orderBy(col("doc_id"))
    }),

    // ---- product quantization (PQ codes + reconstruction error) -------
    "q115_pq_encode" -> ((s, d) => {
      // 4 subspaces × 16 cells, one fused Lloyd round per subspace;
      // oracle unrolls the identical training + encode in SQL
      graft.operators.SimilarityOps.pqEncode(
        t(s, d, "embeddings"), "vec_id", "embedding",
        m = 4, cells = 16, iters = 1)
        .orderBy(col("vec_id"))
    }),

    // ---- PQ asymmetric-distance search --------------------------------
    "q116_pq_adc" -> ((s, d) => {
      // candidates scored from their m PQ codes only (no raw corpus
      // vectors in the scoring join); distance asc, id asc, top-5
      val emb = t(s, d, "embeddings")
      graft.operators.SimilarityOps.pqAdcTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        "vec_id", k = 5, m = 4, cells = 16, iters = 1)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- full IVF-PQ pipeline -----------------------------------------
    "q117_ivfpq" -> ((s, d) => {
      // coarse probe (trained cells, as q40) → ADC shortlist from PQ
      // codes → exact-cosine re-rank of the top-100 → final top-5.
      // rerank=100 keeps recall monotone in nprobe: the ADC stage
      // ranks by subspace L2² while the final order is cosine, so a
      // tight shortlist cut lets extra probed candidates crowd out
      // true neighbors (measured recall@5 fell 0.76→0.70 going
      // nprobe 1→4 at rerank=20; 0.82→0.92 at rerank=100). Still
      // bounded: rerank×queries rows, corpus-size-independent.
      val emb = t(s, d, "embeddings")
      graft.operators.SimilarityOps.ivfPqTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        "vec_id", k = 5, cells = 16, nprobe = 4, coarseIters = 2,
        m = 4, pqCells = 16, pqIters = 1, rerank = 100)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- ANN recall audit (IVF-PQ vs exact) ---------------------------
    "q118_ann_recall" -> ((s, d) => {
      // per-query overlap of q117's IVF-PQ top-5 with the exact top-5
      // — the production quality monitor for an ANN index
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val ops = graft.operators.SimilarityOps
      val exact = ops.bruteForceTopK(emb, q, "vec_id", "embedding",
        "vec_id", k = 5).select(col("query_id"), col("neighbor_id"))
      val approx = ops.ivfPqTopK(emb, q, "vec_id", "embedding",
        "vec_id", k = 5, cells = 16, nprobe = 4, coarseIters = 2,
        m = 4, pqCells = 16, pqIters = 1, rerank = 100)
        .select(col("query_id"), col("neighbor_id"))
      val overlap = exact.join(approx, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
      q.select(col("vec_id").as("query_id"))
        .join(overlap, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n"), lit(0L)).as("recall_at_5"))
        .orderBy(col("query_id"))
    }),

    // ---- duplicated-span fraction (exact-substring dedup signal) ------
    "q119_dup_spans" -> ((s, d) => {
      graft.operators.SpanDedup.dupSpanStats(
        t(s, d, "documents"), "doc_id", "text", k = 5)
        .orderBy(col("doc_id"))
    }),

    // ---- trained quality classifier (logistic GD, integer-summed) -----
    "q120_quality_classifier" -> ((s, d) => {
      // positives = src0 docs; 3 full-batch iterations, lr 0.5
      graft.operators.QualityClassifier.scoreDF(
        t(s, d, "documents"), "doc_id", "text",
        isPositive = col("source") === "src0")
        .orderBy(col("doc_id"))
    }),

    // ---- deterministic training-order permutation ---------------------
    "q114_training_order" -> ((s, d) => {
      // seeded hash-order (shard, pos) addressing — the reproducible
      // "global shuffle" a training loader consumes; no global sort
      graft.operators.ShardExport.trainingOrder(
        t(s, d, "documents"), "doc_id", seed = 42L, shards = 8)
        .orderBy(col("doc_id"))
    }),

    // ---- hybrid retrieval: BM25 + dense, reciprocal-rank fusion -------
    "q146_hybrid_rrf" -> ((s, d) => {
      // the full hybrid search stack: sparse BM25 top-20 and dense
      // hashed-vector top-20 (query text vectorized against CORPUS
      // idf — the external-query path), fused by reciprocal rank
      // (1/(60+rank), Cormack 2009) into a final top-5. Fusion never
      // touches the corpus: two queries×20 lists, one equi-join
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            TextFunctions.tokens(lower(col("text"))), 1, 8)).as("qtext"))
      val sparse = graft.operators.Bm25.topK(docs, "doc_id", "text",
        qs, "query_id", "qtext", k = 20)
      val dense = graft.operators.HashingVectorizer.textTopKFor(
        docs, "doc_id", "text", qs, "query_id", "qtext",
        k = 20, dim = 64)
      graft.operators.HybridSearch.rrf(sparse, "doc_id",
        dense, "neighbor_id", k = 5)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- nearest-centroid label classification ------------------------
    "q147_centroid_classify" -> ((s, d) => {
      // Rocchio topic routing over the embeddings table: per-label
      // mean centroids trained on the 80% slice (labels×dim model
      // metadata), held-out 20% classified by in-row cosine argmax —
      // zero shuffles over the scored corpus. correct/pred per row so
      // the result doubles as the confusion-matrix input
      val emb = t(s, d, "embeddings")
      val train = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val test = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      val cents = graft.operators.CentroidClassifier.trainCentroids(
        train, "label", "embedding")
      graft.operators.CentroidClassifier.classify(
          test, "vec_id", "embedding", cents)
        .join(test.select(col("vec_id"),
          col("label").as("true_label")), Seq("vec_id"))
        .select(col("vec_id"), col("true_label"), col("pred_label"),
          col("pred_cos"),
          (col("pred_label") === col("true_label")).as("correct"))
        .orderBy(col("vec_id"))
    }),

    // ---- duplication-aware sampling weights (soft dedup) --------------
    "q148_soft_dedup_weights" -> ((s, d) => {
      // keep every near-duplicate but down-weight it by cluster size
      // (weight = 1/|cluster|): each cluster contributes one doc's
      // worth of sampling mass. Consumes the shared cluster-map
      // artifact — one size count + one map-sized join on top
      val docs = t(s, d, "documents")
      val cl = graft.operators.DedupClusters.clusterMap(
        docs, "doc_id", "text", threshold = 0.95)
      graft.operators.DedupClusters.duplicationWeights(cl, "doc_id")
        .orderBy(col("doc_id"))
    }),

    // ---- MMR diversified re-ranking -----------------------------------
    "q149_mmr_rerank" -> ((s, d) => {
      // diversify the ANN shortlist: brute-force top-20 per query
      // (vec_id < 5), then 5 greedy MMR rounds (λ=0.7) trade
      // relevance against similarity to the already-selected set.
      // Shortlist + pair sims materialize once; each round is a
      // bounded-heap argmax over queries×20 rows
      val emb = t(s, d, "embeddings")
      val shortlist = graft.operators.SimilarityOps.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        "vec_id", k = 20)
      graft.operators.MmrRerank.rerank(
        shortlist, "cos_sim", emb, "vec_id", "embedding",
        k = 5, lambda = 0.7)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- classifier calibration curve (reliability diagram) -----------
    "q150_calibration_curve" -> ((s, d) => {
      // is q120's score trustworthy as a probability? 1%-wide score
      // bins (fine enough to resolve this classifier's narrow score
      // band) vs empirical positive rate; `gap` is the per-bucket
      // reliability deviation (n-weighted sum = ECE).
      // Scaled-integer sums only — one aggregation over the scored
      // frame, 10 output rows
      graft.operators.QualityClassifier.calibrationCurve(
        t(s, d, "documents"), "doc_id", "text",
        isPositive = col("source") === "src0", buckets = 100)
        .orderBy(col("bucket"))
    }),

    // ---- kNN label voting on the IVF path -----------------------------
    "q151_knn_classify" -> ((s, d) => {
      // the ANN stack as a classifier: held-out vectors (vec_id%5==0)
      // probe the labeled corpus' coarse cells, top-5 cosine neighbors
      // vote (ties → smaller label). Multi-modal label regions that
      // break q147's one-centroid assumption work here — cost is
      // ~nprobe/cells of the labeled corpus per query
      val emb = t(s, d, "embeddings")
      val train = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val test = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      graft.operators.KnnClassifier.classify(
          train, test, "vec_id", "embedding", "label",
          k = 5, cells = 16, nprobe = 4)
        .join(test.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), Seq("query_id"))
        .select(col("query_id").as("vec_id"), col("true_label"),
          col("pred_label"), col("votes"),
          (col("pred_label") === col("true_label")).as("correct"))
        .orderBy(col("vec_id"))
    }),

    // ---- per-language tokenizer fertility ------------------------------
    "q152_tokenizer_fertility" -> ((s, d) => {
      // tokens-per-word by language under the trained 5-merge BPE —
      // the fairness audit run before fixing a token budget across
      // languages (a high-fertility language pays more tokens for the
      // same text). All integer sums; one corpus scan via the shared
      // encodeStats artifact chain
      val docs = t(s, d, "documents")
      graft.operators.Bpe.encodeStats(docs, "doc_id", "text",
          merges = 5)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
          sum(col("n_words")).as("n_words"))
        .withColumn("fertility",
          dround(col("n_bpe_tokens").cast("double") /
            greatest(col("n_words"), lit(1L)).cast("double"), 4)
            + lit(0))
        .orderBy(col("lang"))
    }),

    // ---- multi-epoch training order ------------------------------------
    "q153_epoch_orders" -> ((s, d) => {
      // 3 independent deterministic permutations (epoch folded into
      // the hash seed): the multi-epoch data-loader address space,
      // reproducible and resumable at any (epoch, shard, pos)
      graft.operators.ShardExport.multiEpochOrder(
        t(s, d, "documents"), "doc_id", seed = 42L, shards = 8,
        epochs = 3)
        .orderBy(col("doc_id"), col("epoch"))
    }),

    // ---- RAG context assembly capstone --------------------------------
    "q154_rag_context" -> ((s, d) => {
      // the full retrieval stack end-to-end, as a RAG serving layer
      // would run it: sparse BM25 + dense hashed-vector retrieval,
      // RRF-fused to a 10-doc candidate set, MMR-diversified (λ=0.7,
      // rel = fused score, sims over the shared dense-vector artifact)
      // down to the final 5-doc context. Every stage keeps its own
      // scale shape; the composition adds only shortlist-sized frames
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            TextFunctions.tokens(lower(col("text"))), 1, 8)).as("qtext"))
      val sparse = graft.operators.Bm25.topK(docs, "doc_id", "text",
        qs, "query_id", "qtext", k = 20)
      val dense = graft.operators.HashingVectorizer.textTopKFor(
        docs, "doc_id", "text", qs, "query_id", "qtext",
        k = 20, dim = 64)
      val fused = graft.operators.HybridSearch.rrf(sparse, "doc_id",
        dense, "neighbor_id", k = 10)
      val dv = graft.operators.HashingVectorizer.denseVectors(
        docs, "doc_id", "text", dim = 64)
      graft.operators.MmrRerank.rerank(
        fused.select(col("query_id"),
          col("doc_id").as("neighbor_id"), col("rrf_score")),
        "rrf_score", dv, "doc_id", "vec", k = 5, lambda = 0.7)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- passage-level retrieval, doc-level max-pool ------------------
    "q155_passage_search" -> ((s, d) => {
      // the long-document RAG shape: chunk into overlapping passages
      // (16 tokens, overlap 4), BM25 over the passage table, keep each
      // doc's best passage score, rank docs. Chunking is a pure
      // explode; the passage index inherits BM25's postings shapes
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            TextFunctions.tokens(lower(col("text"))), 1, 8)).as("qtext"))
      val chunks = graft.operators.Chunking.chunkTokens(
          docs, "doc_id", "text", chunkSize = 16, overlap = 4)
        .select((col("doc_id") * 1000 + col("chunk_idx")).as("cid"),
          col("chunk_text"))
      val hits = graft.operators.Bm25.topK(chunks, "cid", "chunk_text",
        qs, "query_id", "qtext", k = 50)
      val byDoc = hits
        .select(col("query_id"), expr("cid DIV 1000").as("doc_id"),
          col("score"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(max(col("score")).as("best_score"),
          count(lit(1)).as("n_passages"))
      graft.functions.TopKByScore.explodeTopK(byDoc,
          Seq("query_id"), col("best_score"), col("doc_id"), 5,
          outId = "doc_id", outScore = "best_score")
        .join(byDoc.select(col("query_id"), col("doc_id"),
          col("n_passages")), Seq("query_id", "doc_id"))
        .select(col("query_id"), col("doc_id"),
          (dround(col("best_score"), 4) + lit(0)).as("best_score"),
          col("n_passages"), col("rn"))
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- retrieval A/B eval: hybrid vs sparse-only --------------------
    "q156_hybrid_ab_eval" -> ((s, d) => {
      // does fusion beat BM25 alone? Rank-of-positive, reciprocal
      // rank, and hit@5 per query for BOTH systems side by side — the
      // A/B table a retrieval team reads before shipping the hybrid.
      // Both metric joins are qrels-sized; the corpus is touched only
      // by the two retrieval stages
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            TextFunctions.tokens(lower(col("text"))), 1, 8)).as("qtext"),
          col("doc_id").as("pos_id"))
      val sparse = graft.operators.Bm25.topK(docs, "doc_id", "text",
        qs, "query_id", "qtext", k = 20)
      val dense = graft.operators.HashingVectorizer.textTopKFor(
        docs, "doc_id", "text", qs, "query_id", "qtext",
        k = 20, dim = 64)
      val hybrid = graft.operators.HybridSearch.rrf(sparse, "doc_id",
        dense, "neighbor_id", k = 20)
      val ev = graft.operators.RetrievalMetrics
      val ms = ev.evaluate(sparse, "doc_id", qs, "pos_id", k = 5)
        .select(col("query_id"), col("pos_rank").as("sparse_rank"),
          col("rr").as("sparse_rr"), col("hit_at_k").as("sparse_hit5"))
      val mh = ev.evaluate(hybrid, "doc_id", qs, "pos_id", k = 5)
        .select(col("query_id"), col("pos_rank").as("hybrid_rank"),
          col("rr").as("hybrid_rr"), col("hit_at_k").as("hybrid_hit5"))
      ms.join(mh, Seq("query_id")).orderBy(col("query_id"))
    }),

    // ---- contrastive training triplets --------------------------------
    "q157_contrastive_triplets" -> ((s, d) => {
      // the export a DPR-style trainer reads: (anchor query, positive,
      // rank-ordered hard negatives) — q141's mining packed into one
      // row per query, negative order pinned in-row (never
      // collect_list arrival order)
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            TextFunctions.tokens(lower(col("text"))), 1, 8)).as("qtext"),
          col("doc_id").as("pos_id"))
      val cl = graft.operators.DedupClusters.clusterMap(
        docs, "doc_id", "text", threshold = 0.95)
      graft.operators.HardNegatives.triplets(docs, "doc_id", "text",
        qs, "query_id", "qtext", "pos_id", cl,
        n = 5, candidateK = 20)
        .orderBy(col("query_id"))
    }),

    // ---- soft-dedup weighted sampling (end to end) --------------------
    "q158_soft_dedup_sample" -> ((s, d) => {
      // the q148 weights actually USED: an Efraimidis-Spirakis draw of
      // 25 docs with inclusion probability ∝ 1/|cluster| — duplicates
      // stay in the pool but a 3-doc cluster carries one doc's worth
      // of mass. A-ES is scale-invariant, so the fractional weights
      // draw correctly; the key math is plain SQL, replayed exactly
      val docs = t(s, d, "documents")
      val cl = graft.operators.DedupClusters.clusterMap(
        docs, "doc_id", "text", threshold = 0.95)
      val wts = graft.operators.DedupClusters
        .duplicationWeights(cl, "doc_id")
      graft.ops.DeterministicSample.weightedTopK(
          wts, "doc_id", "weight", k = 25, seed = "softdedup")
        .join(wts.select(col("doc_id"), col("cluster_id"),
          col("cluster_size")), Seq("doc_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("sample_key"), col("rn"))
        .orderBy(col("rn"))
    }),

    // ---- hybrid retrieval at the SCALE path: BM25 + IVF dense ---------
    "q159_hybrid_ivf" -> ((s, d) => {
      // the 100-TB hybrid: q146's fusion with the dense half on the
      // IVF index instead of the exact bucket join — external query
      // vectors (corpus idf) probe 4 of 16 coarse cells, so each
      // query touches ~nprobe/cells of the corpus. excludeSelf=false:
      // queries are an external relation, so the query's source doc
      // is a legitimate retrieval result
      val docs = t(s, d, "documents")
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ", slice(
            TextFunctions.tokens(lower(col("text"))), 1, 8)).as("qtext"))
      val sparse = graft.operators.Bm25.topK(docs, "doc_id", "text",
        qs, "query_id", "qtext", k = 20)
      val dv = graft.operators.HashingVectorizer.denseVectors(
        docs, "doc_id", "text", dim = 64)
      val qv = graft.operators.HashingVectorizer.queryDenseVectors(
        docs, "doc_id", "text", qs, "query_id", "qtext", dim = 64)
      val dense = graft.operators.SimilarityOps.ivfTopK(
        dv, qv, "doc_id", "vec", "query_id", k = 20,
        cells = 16, nprobe = 4, trainIters = 0, excludeSelf = false)
      graft.operators.HybridSearch.rrf(sparse, "doc_id",
        dense, "neighbor_id", k = 5)
        .orderBy(col("query_id"), col("rn"))
    }),

    // ---- distance-weighted kNN voting ---------------------------------
    "q160_knn_weighted" -> ((s, d) => {
      // q151 with similarity-weighted votes (sklearn weights=
      // "distance"): a single very-close neighbor can outvote two
      // distant ones. Cosines scale to integers before the per-label
      // sum, so vote totals are exact across partitionings
      val emb = t(s, d, "embeddings")
      val train = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val test = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      graft.operators.KnnClassifier.classifyWeighted(
          train, test, "vec_id", "embedding", "label",
          k = 5, cells = 16, nprobe = 4)
        .join(test.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), Seq("query_id"))
        .select(col("query_id").as("vec_id"), col("true_label"),
          col("pred_label"), col("vote_weight"),
          (col("pred_label") === col("true_label")).as("correct"))
        .orderBy(col("vec_id"))
    }),

    // ---- model evaluation: distributed ROC AUC ------------------------
    "q208_roc_auc" -> ((s, d) => {
      // one-vs-rest AUC of the first embedding dimension as a class
      // score: does dim 0 rank class-c vectors above the rest? The
      // bucketed Mann-Whitney statistic never ranks rows globally —
      // scores quantize to integer buckets (exact longs), and the only
      // float op is the final fixed-order division. |classes| is
      // bounded, so the one-vs-rest explode is a broadcast cross join,
      // not a shuffle
      val emb = t(s, d, "embeddings")
      val classes = emb.select(col("label").as("cls")).distinct()
      val rows = emb.crossJoin(broadcast(classes))
        .withColumn("__y", (col("label") === col("cls")).cast("int"))
      graft.ops.MlEval.rocAuc(rows,
          round(element_at(col("embedding"), 1).cast("double") * lit(1e6), 0)
            .cast("long"),
          col("__y"), Seq("cls"))
        .select(col("cls"), dround(col("auc"), 6).as("auc"),
          col("n_pos"), col("n_neg"))
        .orderBy(col("cls"))
    }),

    // ---- leakage-safe categorical feature encoding ---------------------
    "q209_target_encode" -> ((s, d) => {
      // out-of-fold mean target encoding of order priority against the
      // 'order fulfilled' flag, 5 deterministic folds by key modulus,
      // prior-smoothed with m=20 pseudo-rows. A row's own fold (and the
      // prior's share of it) never contributes to its encoding, so the
      // feature is leakage-safe by construction; the encode is one
      // map-side-combined aggregation plus window math on the bounded
      // (cat, fold) table
      graft.ops.MlEval.targetEncode(t(s, d, "orders"),
          col("o_orderpriority"),
          pmod(col("o_orderkey"), lit(5)).cast("int"),
          (col("o_orderstatus") === "F").cast("long"), smoothing = 20.0)
        .select(col("cat"), col("fold"), col("n_oof"),
          dround(col("enc"), 6).as("enc"))
        .orderBy(col("cat"), col("fold"))
    }),

    // ---- chi-square term selection --------------------------------------
    "q210_chi2_terms" -> ((s, d) => {
      // supervised feature selection: which terms' document frequency
      // is most dependent on the lang='en' label (2x2 chi-square per
      // term, doc-level presence, min df 5)? Counts are exact longs off
      // one distinct + one aggregation; the statistic is computed in
      // double with a fixed op order so the oracle replays it bit-wise
      // null-safe label: a NULL lang is a non-'en' doc (0), matching
      // the oracle's CASE WHEN ... ELSE 0. A bare boolean cast yields
      // NULL for NULL lang, which would null out `a` and silently drop
      // terms whose qualifying docs are all NULL-lang at the df filter
      val docs = t(s, d, "documents")
      val isEn = when(col("lang") === "en", 1L).otherwise(0L)
      val pres = docs
        .select(col("doc_id"), isEn.as("__y"),
          explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .filter(length(col("term")) >= 3)
        .distinct()
      val tot = docs.agg(count(lit(1)).as("__nn"),
        sum(isEn).as("__aa"))
      pres.groupBy(col("term"))
        .agg(sum(col("__y")).as("a"),
          (count(lit(1)) - sum(col("__y"))).as("b"))
        .filter(col("a") + col("b") >= 5)
        .crossJoin(broadcast(tot))
        .withColumn("c", col("__aa") - col("a"))
        .withColumn("dd", (col("__nn") - col("__aa")) - col("b"))
        .withColumn("chi2", dround(
          col("__nn").cast("double")
            * pow(col("a").cast("double") * col("dd")
                - col("b").cast("double") * col("c"), 2)
            / ((col("a") + col("b")).cast("double")
              * (col("c") + col("dd")).cast("double")
              * (col("a") + col("c")).cast("double")
              * (col("b") + col("dd")).cast("double")), 4))
        .select(col("term"), col("a"), col("b"), col("chi2"))
        .orderBy(col("chi2").desc, col("term"))
        .limit(30)
    }),

    // ---- graph analytics: degree-oriented triangle counting ------------
    "q211_triangles" -> ((s, d) => {
      // parts bought together in >= 2 distinct order events form the
      // co-purchase graph; triangle participation per part is the
      // community-density signal. Degree orientation bounds every
      // node's wedge fan-out by O(sqrt(m)) so hub skew never lands on
      // one reducer (the oracle counts the same triangles the naive
      // u<v<w way — results match, plans don't have to)
      val pairs = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = pairs.as("x").join(pairs.as("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("u"), col("y.pk").as("v"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("u"), col("v"))
      graft.ops.Triangles.perNode(edges)
        .orderBy(col("n_tri").desc, col("node"))
    }),

    // ---- privacy: noisy-histogram release mechanism ---------------------
    "q212_dp_counts" -> ((s, d) => {
      // Laplace(1/eps) noisy per-(source, lang) counts with stability
      // thresholding — the (eps, delta)-DP histogram release MECHANISM
      // with a seeded inverse-CDF uniform so the run is reproducible
      // (production swaps in a CSPRNG; see Anonymity.dpCounts's honesty
      // note). eps=0.5, release threshold 10
      graft.ops.Anonymity.dpCounts(t(s, d, "documents"),
          Seq("source", "lang"), epsilon = 0.5, threshold = 10.0)
        .orderBy(col("source"), col("lang"))
    }),

    // ---- time series: dominant-period detection -------------------------
    "q213_period_detect" -> ((s, d) => {
      // which lag maximizes each user's click-series autocorrelation
      // (lags 1..6, >= 8 aligned pairs)? This is the data-driven 'm'
      // that q195's Holt-Winters seasonality needs. One lag-explode
      // join aligns all six lags in a single shuffle; Pearson
      // components are exact long sums of e2-quantized values (the
      // q206 discipline), so only the final sqrt/divide is float
      val base = t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .withColumn("x", round(col("v") * lit(100), 0).cast("long"))
        .withColumn("idx", row_number().over(Window
          .partitionBy(col("user_id")).orderBy(col("t_us"))))
        .select(col("user_id"), col("idx"), col("x"))
      val lags = s.range(1, 7).select(col("id").cast("int").as("lag"))
      val pairsAc = base.crossJoin(broadcast(lags)).as("cur")
        .join(base.select(col("user_id"), col("idx").as("pidx"),
          col("x").as("y")).as("prev"),
          col("cur.user_id") === col("prev.user_id")
            && col("prev.pidx") === col("cur.idx") - col("cur.lag"))
        .select(col("cur.user_id").as("user_id"), col("cur.lag").as("lag"),
          col("cur.x").as("x"), col("prev.y").as("y"))
      val st = pairsAc.groupBy(col("user_id"), col("lag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .filter(col("n") >= 8)
        .withColumn("num", (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double"))
        .withColumn("dx", (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double"))
        .withColumn("dy", (col("n") * col("syy") - col("sy") * col("sy"))
          .cast("double"))
        .filter(col("dx") > 0 && col("dy") > 0)
        .withColumn("acf", dround(col("num") / (sqrt(col("dx")) * sqrt(col("dy"))), 4))
      st.withColumn("rn", row_number().over(Window
          .partitionBy(col("user_id"))
          .orderBy(col("acf").desc, col("lag"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("lag").as("best_lag"),
          (col("acf") + lit(0)).as("acf"))
        .orderBy(col("user_id"))
    }),

    // ---- drift: exact two-sample Kolmogorov-Smirnov -------------------
    "q214_ks_drift" -> ((s, d) => {
      // PSI's binless complement: the max CDF gap between the view and
      // click value distributions. The gap numerator is a cross-
      // multiplied BIGINT (exact while n_ref*n_cur < 2^63), the single
      // float division happens once after the max, and the window runs
      // over the quantization-bounded value spine, never the corpus
      val ev = t(s, d, "events")
        .filter(col("value").isNotNull)
        .withColumn("v", round(col("value") * lit(100), 0).cast("long"))
      graft.ops.DriftMonitor.ks(
        ev.filter(col("event_type") === "view").select(col("v")),
        ev.filter(col("event_type") === "click").select(col("v")), "v")
    }),

    // ---- forecasting: split conformal prediction intervals -------------
    "q215_conformal" -> ((s, d) => {
      // distribution-free 80% intervals for the naive (carry-forward)
      // one-step forecaster on each user's click series: first half of
      // the absolute one-step errors calibrates qhat = the
      // ceil(0.8*(n+1))-th smallest, second half measures coverage.
      // Errors are e2-quantized longs so the order statistic is exact;
      // users need >= 11 errors so the 80% level has a finite qhat
      val W = org.apache.spark.sql.expressions.Window
      val wu = W.partitionBy(col("user_id")).orderBy(col("t_us"))
      val base = t(s, d, "events")
        .filter(col("event_type") === "click" && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
          col("value"))
        .groupBy(col("user_id"), col("t_us"))
        .agg(max(col("value")).as("v"))
        .withColumn("x", round(col("v") * lit(100), 0).cast("long"))
      val errs = base
        .withColumn("err", abs(col("x") - lag(col("x"), 1).over(wu)))
        .withColumn("eidx", row_number().over(wu) - lit(1))
        .filter(col("err").isNotNull)
        .withColumn("n",
          count(lit(1)).over(W.partitionBy(col("user_id"))))
        .filter(col("n") >= 11)
        .withColumn("cal",
          col("eidx") <= floor(col("n") / lit(2.0)))
      graft.ops.MlEval.conformalSplit(errs, Seq("user_id"),
          "err", "cal", alpha = 0.2)
        .select(col("user_id"), col("n_cal"), col("qhat"),
          col("n_test"), col("n_covered"), col("coverage"))
        .orderBy(col("user_id"))
    }),

    // ---- monitoring: incrementally maintained AUC ----------------------
    "q216_incremental_auc" -> ((s, d) => {
      // the model-monitoring view: AUC of the dim-0 score for class 0
      // over an eval log that lands in three appends. The maintained
      // view is the (score-bucket -> positives, total) count table —
      // additive under appends, so refreshes 2 and 3 scan ONLY the new
      // files (mode asserted) — and the AUC post-math runs on the
      // bounded bucket table. Bit-identical to the one-shot q208 math
      val emb = t(s, d, "embeddings")
      val rows = emb.select(col("vec_id"),
        round(element_at(col("embedding"), 1).cast("double") * lit(1e6), 0)
          .cast("long").as("s"),
        (col("label") === 0).cast("int").as("y"))
      val root = s"${graft.core.Scratch.root(emb)}/incauc_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (base, agg) = (s"$root/base", s"$root/agg")
      for (i <- 0 to 2) {
        graft.core.VersionedTable.commitAppend(
          rows.filter(pmod(col("vec_id"), lit(3)) === i), base)
        val r = graft.ops.IncrementalAgg.maintain(
          s, base, agg, Seq("s"), "y")
        require(i == 0 || r.mode == "incremental",
          s"append $i refreshed via ${r.mode}, not the delta path")
      }
      graft.ops.MlEval.aucFromCounts(
          graft.ops.IncrementalAgg.read(s, agg), "s", "sum_val", "n_rows")
        .select(dround(col("auc"), 6).as("auc"),
          col("n_pos"), col("n_neg"))
    }),

    // ---- behavioral modeling: first-order Markov transitions ------------
    "q217_markov_transitions" -> ((s, d) => {
      // the next-event transition matrix per source state, with the
      // per-state transition entropy (how predictable is what follows
      // an 'error'?) and the modal next event. Counts are exact longs
      // off ONE lag window + one aggregation; each entropy term is
      // integer-scaled at 1e-9 BEFORE the per-state sum (the PSI
      // discipline) so no float addition crosses an exchange
      val W = org.apache.spark.sql.expressions.Window
      val seq = t(s, d, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(W
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
        .filter(col("prev").isNotNull)
      val tr = seq.groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      val wp = W.partitionBy(col("prev"))
      val pExact = col("n").cast("double") / col("t").cast("double")
      tr.withColumn("t", sum(col("n")).over(wp))
        .withColumn("p", dround(pExact, 4))
        .withColumn("__term_s",
          round(-pExact * log(pExact) * lit(1e9)).cast("long"))
        .withColumn("h_prev", dround(
          sum(col("__term_s")).over(wp).cast("double") / lit(1e9), 6))
        .withColumn("rn", row_number().over(
          wp.orderBy(col("n").desc, col("next"))))
        .select(col("prev"), col("next"), col("n"), col("p"),
          (col("rn") === 1).as("is_modal"), col("h_prev"))
        .orderBy(col("prev"), col("next"))
    }),

    // ---- time series: lead-lag cross-correlation -------------------------
    "q218_lead_lag" -> ((s, d) => {
      // does view activity LEAD clicks? Hourly per-user buckets of both
      // series (sums of e2-quantized longs — exact), one broadcast
      // lag-spine join aligns all 7 offsets of views against clicks,
      // and the per-lag Pearson runs on long components (the q206/q213
      // discipline). The peak lag is the pipeline's attribution window
      def bucketed(eventType: String, out: String) =
        t(s, d, "events")
          .filter(col("event_type") === eventType
            && col("value").isNotNull)
          .groupBy(col("user_id"),
            floor(unix_micros(col("ts")) / lit(3.6e9)).cast("long")
              .as("hb"))
          .agg(sum(round(col("value") * lit(100), 0).cast("long"))
            .as(out))
      val c = bucketed("click", "x")
      val v = bucketed("view", "y")
      val lags = s.range(-3, 4).select(col("id").cast("int").as("lag"))
      val pairs = c.crossJoin(broadcast(lags)).as("c")
        .join(v.as("v"), col("v.user_id") === col("c.user_id")
          && col("v.hb") === col("c.hb") + col("c.lag"))
        .select(col("c.lag").as("lag"), col("c.x").as("x"),
          col("v.y").as("y"))
      pairs.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("num", (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double"))
        .withColumn("dx", (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double"))
        .withColumn("dy", (col("n") * col("syy") - col("sy") * col("sy"))
          .cast("double"))
        .select(col("lag"), col("n"),
          when(col("n") >= 30 && col("dx") > 0 && col("dy") > 0,
            dround(col("num") / (sqrt(col("dx")) * sqrt(col("dy"))), 4)
              + lit(0)).as("xcorr"))
        .orderBy(col("lag"))
    }),

    // ---- model evaluation: PR AUC (average precision) ------------------
    "q219_pr_auc" -> ((s, d) => {
      // q208's companion for class imbalance: step-wise average
      // precision from the same integer score buckets — ROC AUC
      // barely moves at a 1:9 positive rate, precision collapses.
      // Each threshold-block term is scaled to BIGINT at 1e-9 before
      // the cross-exchange sum (the PSI discipline)
      val emb = t(s, d, "embeddings")
      val classes = emb.select(col("label").as("cls")).distinct()
      val rows = emb.crossJoin(broadcast(classes))
        .withColumn("__y", (col("label") === col("cls")).cast("int"))
      graft.ops.MlEval.prAuc(rows,
          round(element_at(col("embedding"), 1).cast("double") * lit(1e6), 0)
            .cast("long"),
          col("__y"), Seq("cls"))
        .select(col("cls"), dround(col("pr_auc"), 6).as("pr_auc"),
          col("n_pos"), col("n_neg"))
        .orderBy(col("cls"))
    }),

    // ---- curation: corpus concentration audit ---------------------------
    "q220_source_gini" -> ((s, d) => {
      // is one source dominating a language's text mass? Per-lang Gini
      // of char mass across sources: the rank sum stays in exact
      // BIGINTs over the vocabulary-sized (lang, source) table, two
      // fixed-order divisions per lang at the end
      val masses = t(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(sum(col("n_chars")).as("x"))
      graft.ops.RobustStats.gini(masses, "x", Seq("lang"))
        .orderBy(col("lang"))
    }),

    // ---- 100 TB swap: sketch-median MAD with a rank envelope ----------
    "q221_mad_approx" -> ((s, d) => {
      // the single-pass approx_percentile path of q202's MAD chain
      // (RobustStats.madOutliers(approx = true)) held to the GK
      // guarantee, not to bit-identity: per user, the sketch median
      // and the sketch MAD must each be an ELEMENT of their multiset
      // whose rank interval intersects the middle ranks within
      // n/accuracy (+1 slack) — the q75 envelope discipline applied to
      // order statistics. The oracle replays n exactly and pins both
      // envelope booleans TRUE
      val clicks = t(s, d, "events").filter(col("event_type") === "click")
      val app = graft.ops.RobustStats.madOutliers(
          clicks, Seq("user_id"), "ts", "value", k = 3.0,
          approx = true, accuracy = 1000)
        .groupBy(col("user_id"))
        // med/mad are per-user constants; recover the exact scaled
        // longs (x/100*100 round-trips under round)
        .agg(round(max(col("med")) * lit(100), 0).cast("long").as("__m"),
          round(max(col("mad")) * lit(100), 0).cast("long").as("__d"))
      val base = clicks.filter(col("value").isNotNull)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).cast("double").as("v"))
        .withColumn("__ve", round(col("v") * lit(100), 0).cast("long"))
      val j = base.join(app, Seq("user_id"))
        .withColumn("__ad", abs(col("__ve") - col("__m")))
      val env = j.groupBy(col("user_id")).agg(
        count(lit(1)).as("n"),
        sum(when(col("__ve") < col("__m"), 1L).otherwise(0L)).as("__ml"),
        sum(when(col("__ve") <= col("__m"), 1L).otherwise(0L)).as("__mle"),
        sum(when(col("__ad") < col("__d"), 1L).otherwise(0L)).as("__dl"),
        sum(when(col("__ad") <= col("__d"), 1L).otherwise(0L)).as("__dle"))
      def rankOk(l: org.apache.spark.sql.Column,
          le: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val n = col("n").cast("double")
        val slack = ceil(n / lit(1000.0)) + lit(1.0)
        val loRank = floor((n + lit(1.0)) / lit(2.0))
        val hiRank = floor(n / lit(2.0)) + lit(1.0)
        (le > l) && (le.cast("double") >= loRank - slack) &&
          ((l + lit(1)).cast("double") <= hiRank + slack)
      }
      env.select(col("user_id"), col("n"),
        rankOk(col("__ml"), col("__mle")).as("med_ok"),
        rankOk(col("__dl"), col("__dle")).as("mad_ok"))
        .orderBy(col("user_id"))
    }),

    // ---- 100 TB swap: KS spine guard + auto-coarsening -----------------
    "q222_ks_coarse" -> ((s, d) => {
      // q214's KS with the spine deliberately over the guard (joint
      // view/click support is > 256 at every sf): ks() refuses the
      // single-task window and re-buckets both sides onto a ≤256-point
      // equal-width spine keyed by lower edge. The oracle replays the
      // bucketing arithmetic (lo, ceil-step, div), the KS math, AND
      // the support-conditional guard itself (step = 1 when the spine
      // fits), so a drifted guard breaks the hash even at an sf where
      // the support dips under the threshold; ks_hi (lower bound +
      // largest within-bucket mass) makes the coarse verdict two-sided
      val ev = t(s, d, "events")
        .filter(col("value").isNotNull)
        .withColumn("v", round(col("value") * lit(100), 0).cast("long"))
      graft.ops.DriftMonitor.ks(
        ev.filter(col("event_type") === "view").select(col("v")),
        ev.filter(col("event_type") === "click").select(col("v")), "v",
        maxSupport = 256, coarsenTo = 256)
    }),

    // ---- behavioral: second-order Markov transitions --------------------
    "q223_markov2" -> ((s, d) => {
      // does one more token of history buy predictability? The
      // transition matrix keyed by the BIGRAM state (prev2, prev1) →
      // next, with per-state entropy — q217's vocabulary-sized
      // aggregation and 1e-9-scaled integer entropy discipline
      // verbatim; comparing h_state against q217's h_prev for the same
      // prev1 is the order-selection signal. States need >= 5
      // observations so the matrix rows are estimable
      val W = org.apache.spark.sql.expressions.Window
      val wo = W.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val seq = t(s, d, "events")
        .withColumn("p1", lag(col("event_type"), 1).over(wo))
        .withColumn("p2", lag(col("event_type"), 2).over(wo))
        .filter(col("p2").isNotNull)
      val tr = seq.groupBy(col("p2"), col("p1"),
          col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      val wp = W.partitionBy(col("p2"), col("p1"))
      val pExact = col("n").cast("double") / col("t").cast("double")
      tr.withColumn("t", sum(col("n")).over(wp))
        .filter(col("t") >= 5)
        .withColumn("p", dround(pExact, 4))
        .withColumn("__term_s",
          round(-pExact * log(pExact) * lit(1e9)).cast("long"))
        .withColumn("h_state", dround(
          sum(col("__term_s")).over(wp).cast("double") / lit(1e9), 6))
        .withColumn("rn", row_number().over(
          wp.orderBy(col("n").desc, col("next"))))
        .select(col("p2"), col("p1"), col("next"), col("n"), col("p"),
          (col("rn") === 1).as("is_modal"), col("h_state"))
        .orderBy(col("p2"), col("p1"), col("next"))
    }),

    // ---- behavioral: time-decayed Markov transitions --------------------
    "q225_markov_decay" -> ((s, d) => {
      // recency-weighted transition matrix: each user's k-th most
      // recent transition carries weight (1/2)^k — recent behavior
      // dominates, ancient history fades. The decay stays EXACT
      // integer arithmetic end-to-end: 2^(30−k) by bit shift (zero
      // past k = 30, where the weight is < 1e-9 of the newest —
      // already invisible at the 6-dp probability rounding), so the
      // cross-user mass sums are plain BIGINTs and the only float is
      // the final probability division — no pow(), nothing an engine
      // could round differently. The 2^30 ceiling bounds each user's
      // total mass below 2^31, so the per-prev BIGINT sum is exact up
      // to ~4×10^9 users — past ANY real user cardinality (a 2^40
      // ceiling would silently wrap Spark's non-ANSI sum near 4M
      // users while DuckDB raised, the worst kind of divergence)
      val W = org.apache.spark.sql.expressions.Window
      val wo = W.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val seq = t(s, d, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(wo))
        .filter(col("prev").isNotNull)
        .withColumn("k", row_number().over(W.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)) - 1)
        .withColumn("w", when(col("k") <= 30,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - k AS INT))"))
          .otherwise(lit(0L)))
      val tr = seq.groupBy(col("prev"), col("event_type").as("next"))
        .agg(sum(col("w")).as("mass"), count(lit(1)).as("n"))
      val wp = W.partitionBy(col("prev"))
      tr.withColumn("t", sum(col("mass")).over(wp))
        .filter(col("t") > 0)
        .withColumn("p_decay", dround(
          col("mass").cast("double") / col("t").cast("double"), 6))
        .withColumn("rn", row_number().over(
          wp.orderBy(col("mass").desc, col("next"))))
        .select(col("prev"), col("next"), col("n"), col("mass"),
          col("p_decay"), (col("rn") === 1).as("is_modal"))
        .orderBy(col("prev"), col("next"))
    }),

    // ---- drift: incrementally maintained KS view ------------------------
    "q226_incremental_ks" -> ((s, d) => {
      // drift monitoring over a GROWING current window without
      // rescans: the click-value histogram view maintains from deltas
      // (half the clicks commit, the view initializes; the other half
      // appends and delta-merges — the emitted mode pins the cheap
      // path), then the maintained counts feed the same guarded KS
      // math as q214 against the view-events reference. Histogram
      // counts are additive under appends, so the maintained view is
      // bit-identical to a one-shot aggregation — the oracle derives
      // the statistic from the raw tables and pins mode='incremental'
      val ev = t(s, d, "events").filter(col("value").isNotNull)
        .withColumn("v", round(col("value") * lit(100), 0).cast("long"))
      // materialized reference counts: the guarded KS plan consumes
      // the count table twice (guard stats + the math), and a raw
      // events aggregation would scan the corpus twice — a persisted
      // reference histogram is also what a production monitor holds
      val ref = graft.core.Scratch.materialize(
        ev.filter(col("event_type") === "view")
          .groupBy(col("v")).agg(count(lit(1)).as("n")), "ksref")
      val clicks = ev.filter(col("event_type") === "click").select("v")
      val root = s"${graft.core.Scratch.root(ev)}/ksview_" +
        java.util.UUID.randomUUID()
      graft.core.Scratch.registerForCleanup(root)
      val (base, agg) = (s"$root/base", s"$root/agg")
      graft.core.VersionedTable.commitAppend(
        clicks.filter(col("v") % 2 === 0), base)
      graft.ops.IncrementalAgg.maintain(s, base, agg, Seq("v"), "v")
      graft.core.VersionedTable.commitAppend(
        clicks.filter(col("v") % 2 =!= 0), base)
      val r = graft.ops.IncrementalAgg.maintain(s, base, agg,
        Seq("v"), "v")
      val cur = graft.ops.IncrementalAgg.read(s, agg)
        .select(col("v"), col("n_rows").as("n"))
      graft.ops.DriftMonitor.ksGuarded(ref, cur,
          maxSupport = 1 << 20, coarsenTo = 0)
        .select(lit(r.mode).as("mode"), col("n_ref"), col("n_cur"),
          col("ks_at"), col("ks"))
    }),

    // ---- tokenizer: soft-EM unigram refinement --------------------------
    "q224_unigram_soft_em" -> ((s, d) => {
      // one SOFT-EM refinement of the unigram vocab — forward-backward
      // expected counts over every word's full segmentation lattice
      // (Kudo 2018's real E-step; q182's hard-Viterbi assignment was
      // the documented deviation, now closed). Probabilities are exact
      // rationals, the α/β op order is pinned, and posteriors quantize
      // per word, so the DuckDB oracle replays the whole lattice with
      // recursive CTEs and the hash is exact — see
      // functions.UnigramExpectedUsage. iters=1/prune=false is the
      // single-refinement mode of the one trainSoftEm entry point
      graft.operators.Unigram.trainSoftEm(
          t(s, d, "documents"), "text", vocabSize = 40,
          maxPieceLen = 4, iters = 1, prune = false)
        .orderBy(col("piece"))
    }),

    // ---- tokenizer: soft-EM TRAINING loop (EM + prune-by-loss) ---------
    "q227_unigram_train" -> ((s, d) => {
      // two full rounds of Kudo 2018's training loop: q224's soft
      // E-step + M-step rescore, then prune the multi-char pieces
      // whose removal costs the least corpus likelihood — loss =
      // expected_usage × (score − best alternative segmentation
      // score over proper compositions), exact BigInt ranking — keep
      // ceil(3/4) per round (never below target), renormalize the
      // survivors into the next round's exact-rational probabilities.
      // The oracle unrolls BOTH lattices and BOTH prunes in recursive
      // CTEs, so every posterior, every loss product, and both
      // shrink arithmetic rounds replay bit-exact
      graft.operators.Unigram.trainSoftEm(
        t(s, d, "documents"), "text", vocabSize = 40,
        maxPieceLen = 4, iters = 2, targetVocab = 20)
    }))
}
