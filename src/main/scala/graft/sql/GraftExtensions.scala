package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.Decimal

import graft.functions.{CmsEstimate, CmsMergeAgg, CmsTotal, CosineSim, CountMinAgg, HyperplaneLsh, MinHashSignature, QSketchQuery, QuantileSketchAgg, QuantileSketchMergeAgg, SimHash64, TopKByScore, WordShingles}

/** Cluster-wide installer for the graft SQL function surface:
  *
  * {{{ spark.sql.extensions=graft.sql.GraftExtensions }}}
  *
  * makes `simhash64`, `minhash_signature`, `word_shingles` and
  * `hyperplane_lsh` resolve in every session of the cluster — plain
  * SQL users (notebooks, JDBC gateways) get the dedup/ANN expressions
  * without any Scala entry point. The per-session alternative remains
  * [[GraftSql.registerFunctions]]; both share one builder table so the
  * two registration paths cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(builder.getClass.getName, name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
    // opt-in (spark.graft.rangeJoin.binSize > 0): plain-SQL range joins
    // become bucketed equi-joins instead of nested-loop joins
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // maintenance verbs (OPTIMIZE/VACUUM/CLONE/RESTORE/DESCRIBE
    // DETAIL/FORGET/ERASE) as SQL statements; everything else falls
    // through to the stock parser
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // defense-in-depth for the ordered-fold aggregates: reject grouping
    // -aggregate use at ANALYSIS time, before a physical mode is chosen
    // (the merge-raise alone only fires if the planner picks
    // Partial+Final; a Complete-mode plan would skip merge entirely)
    ext.injectCheckRule(_ => graft.plans.OrderedFoldCheck)
  }
}

object GraftExtensions {
  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    // SQL also spells sizes as other integral LITERALS (32L, 16S,
    // 8Y); accept any that fits an Int. (A CAST(32 AS BIGINT) is a
    // Cast node at resolution time, not a literal — still rejected,
    // like any non-literal expression.)
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _)
        if v.isValidInt => v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Short, _) =>
      v.toInt
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Byte, _) =>
      v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def doubleArg(e: Expression, what: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Decimal, _) =>
      v.toDouble
    // SQL spells integral parameters as Int/Long literals (cusum(v,
    // 100, 10)); rejecting them as "not numeric" is a contradiction
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
      v.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
      v.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Float, _) =>
      v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** name → expression builder; the single source of truth for both
    * the extensions path and [[GraftSql.registerFunctions]]. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (exprs => SimHash64(exprs.head)),
    "minhash_signature" -> (exprs =>
      MinHashSignature(exprs(0), intArg(exprs(1), "k"))),
    "word_shingles" -> (exprs =>
      WordShingles(exprs(0), intArg(exprs(1), "n"))),
    "char_ngrams" -> (exprs =>
      graft.functions.CharNgrams(exprs(0), intArg(exprs(1), "n"))),
    "hyperplane_lsh" -> (exprs =>
      HyperplaneLsh(exprs(0), intArg(exprs(1), "bits"),
        if (exprs.length > 2) intArg(exprs(2), "seed") else 42)),
    "top_k_by_score" -> (exprs =>
      TopKByScore(exprs(0), exprs(1), intArg(exprs(2), "k"))
        .toAggregateExpression()),
    "cosine_sim" -> (exprs => CosineSim(exprs(0), exprs(1))),
    // mergeable sketches: count-min (frequencies) and GK (quantiles)
    "count_min" -> (exprs =>
      CountMinAgg(exprs(0),
        if (exprs.length > 1) intArg(exprs(1), "depth") else 5,
        if (exprs.length > 2) intArg(exprs(2), "width") else 1024)
        .toAggregateExpression()),
    "cms_merge" -> (exprs =>
      CmsMergeAgg(exprs.head).toAggregateExpression()),
    "cms_estimate" -> (exprs => CmsEstimate(exprs(0), exprs(1))),
    "cms_total" -> (exprs => CmsTotal(exprs.head)),
    "quantile_sketch" -> (exprs =>
      QuantileSketchAgg(exprs(0),
        if (exprs.length > 1) doubleArg(exprs(1), "relativeError")
        else 0.01).toAggregateExpression()),
    "quantile_sketch_merge" -> (exprs =>
      QuantileSketchMergeAgg(exprs.head).toAggregateExpression()),
    "quantile_sketch_query" -> (exprs =>
      QSketchQuery(exprs(0), exprs(1))),
    // media byte-level parsing/decode (multimodal QA from plain SQL)
    "media_header" -> (exprs =>
      graft.multimodal.MediaHeaderExpr(exprs.head)),
    "bmp_pixel_stats" -> (exprs =>
      graft.multimodal.BmpPixelStatsExpr(exprs.head)),
    "wav_pcm_stats" -> (exprs =>
      graft.multimodal.WavPcmStatsExpr(exprs.head)),
    "png_pixel_stats" -> (exprs =>
      graft.multimodal.PngPixelStatsExpr(exprs.head)),
    "image_resize" -> (exprs =>
      graft.multimodal.ImageResizeExpr(exprs(0),
        intArg(exprs(1), "outW"), intArg(exprs(2), "outH"))),
    "wav_resample" -> (exprs =>
      graft.multimodal.AudioResampleExpr(exprs(0),
        intArg(exprs(1), "outN"))),
    // compressed-payload decode (gzipped records from plain SQL)
    "gunzip" -> (exprs => graft.functions.GunzipExpr(exprs.head)),
    "gunzip_text" -> (exprs =>
      graft.functions.GunzipTextExpr(exprs.head)),
    // compression-ratio quality signal (deflate the UTF-8 bytes)
    "deflate_len" -> (exprs =>
      graft.functions.DeflateLenExpr(exprs.head)),
    // Unicode canonical composition (text canonicalization pre-dedup)
    "nfc_normalize" -> (exprs =>
      graft.functions.NfcNormalizeExpr(exprs.head)),
    // fuzzy-linkage scorers (Spark ships levenshtein but no Jaro)
    "jaro_similarity" -> (exprs =>
      graft.functions.JaroSimilarityExpr(exprs(0), exprs(1))),
    "jaro_winkler_similarity" -> (exprs =>
      graft.functions.JaroWinklerExpr(exprs(0), exprs(1))),
    // ordered statistical folds (window running frames only — the
    // aggregates raise on the groupBy merge path by construction);
    // arity-checked so a wrong-arity SQL call names the signature
    // instead of throwing IndexOutOfBounds from the analyzer
    "ewma" -> (exprs => {
      require(exprs.length == 2, "ewma(x, alpha) takes 2 arguments")
      graft.functions.EwmaAgg(exprs(0), doubleArg(exprs(1), "alpha"))
    }),
    "cusum" -> (exprs => {
      require(exprs.length == 3, "cusum(x, mu, slack) takes 3 arguments")
      graft.functions.CusumAgg(exprs(0), doubleArg(exprs(1), "mu"),
        doubleArg(exprs(2), "slack"))
    }),
    "holt" -> (exprs => {
      require(exprs.length == 3, "holt(x, alpha, beta) takes 3 arguments")
      graft.functions.HoltAgg(exprs(0), doubleArg(exprs(1), "alpha"),
        doubleArg(exprs(2), "beta"))
    }),
    "ewvar" -> (exprs => {
      require(exprs.length == 2, "ewvar(x, alpha) takes 2 arguments")
      graft.functions.EwVarAgg(exprs(0), doubleArg(exprs(1), "alpha"))
    }),
    "kalman" -> (exprs => {
      require(exprs.length == 3, "kalman(z, q, r) takes 3 arguments")
      graft.functions.KalmanAgg(exprs(0), doubleArg(exprs(1), "q"),
        doubleArg(exprs(2), "r"))
    }),
    "holt_winters" -> (exprs => {
      require(exprs.length == 5,
        "holt_winters(x, alpha, beta, gamma, m) takes 5 arguments")
      graft.functions.HoltWintersAgg(exprs(0),
        doubleArg(exprs(1), "alpha"), doubleArg(exprs(2), "beta"),
        doubleArg(exprs(3), "gamma"), intArg(exprs(4), "m"))
    }))
}
