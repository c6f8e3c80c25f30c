package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy release-gate audits over quasi-identifier (QI) columns —
  * the checks a curation pipeline runs before publishing any
  * user-adjacent table:
  *
  *  - k-anonymity (Sweeney 2002): every row must be indistinguishable
  *    from at least k−1 others on its QI tuple; a QI class smaller
  *    than k re-identifies its members by linkage.
  *  - l-diversity (Machanavajjhala et al. 2007): a k-anonymous class
  *    whose SENSITIVE attribute is constant still leaks it
  *    (homogeneity attack) — each class must carry ≥ l distinct
  *    sensitive values.
  *
  * These are AUDITS, not fixes: the remediation loop is coarsen a QI
  * column (bucket, truncate — [[graft.operators.Masking]]'s
  * generalization direction) or suppress the violating classes, then
  * re-audit.
  *
  * Shape at scale: one map-side-combined aggregation on the QI tuple
  * — classes are vocabulary-sized, never corpus-sized; the sensitive
  * distinct-count rides the same exchange as a count-distinct. The
  * per-row risk view joins back on the key the aggregation just
  * partitioned by (exchange reuse, the SpanDedup discipline).
  */
object Anonymity {

  /** Per-equivalence-class audit: the QI columns + `class_size` +
    * `anonymous` (size ≥ k) + `l_distinct` (distinct sensitive
    * values in the class). One aggregation pass. */
  def classAudit(df: DataFrame, qiCols: Seq[String], k: Int,
      sensitive: Column): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs >= 1 QI column")
    require(k >= 1, "k must be >= 1")
    df.groupBy(qiCols.map(col(_)): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("l_distinct"))
      .withColumn("anonymous", col("class_size") >= k)
  }

  /** One-row release-gate summary: class counts, rows at risk, and
    * the table's effective k and l (the minima an attacker faces). */
  def report(df: DataFrame, qiCols: Seq[String], k: Int, l: Int,
      sensitive: Column): DataFrame =
    classAudit(df, qiCols, k, sensitive)
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < k, 1L).otherwise(0L))
          .as("n_violating_classes"),
        sum(when(col("class_size") < k, col("class_size"))
          .otherwise(0L)).as("n_rows_at_risk"),
        min(col("class_size")).as("k_effective"),
        min(col("l_distinct")).as("l_effective"))
      .withColumn("passes",
        col("k_effective") >= k && col("l_effective") >= l)

  /** Per-row risk view: the input plus its class's size and a
    * `suppress` flag — the frame a remediation pass filters on. */
  def rowRisk(df: DataFrame, qiCols: Seq[String], k: Int,
      sensitive: Column): DataFrame =
    df.join(classAudit(df, qiCols, k, sensitive)
        .select(qiCols.map(col(_)) :+ col("class_size"): _*),
      qiCols)
      .withColumn("suppress", col("class_size") < k)

  /** Noisy-histogram release: per-class counts + Laplace(1/ε) noise via
    * the inverse CDF, then stability thresholding — the mechanism of an
    * (ε, δ)-DP histogram over an unbounded key domain.
    *
    * RELEASE CONTRACT: the frame returned here is the AUDIT view — it
    * carries every class with a `released` flag so a pipeline can see
    * what thresholding suppressed. The (ε, δ)-DP stability-thresholding
    * argument requires that below-threshold classes be WITHHELD from
    * any external release (key-domain membership is itself sensitive):
    * publish [[dpRelease]] (which drops `released = false` rows and the
    * flag), never this frame.
    *
    * Randomness, two modes:
    *  - `seeded = true` (default): the uniform driving the inverse CDF
    *    is a seeded LCG over the class's rank in key order — runs are
    *    reproducible and oracle-testable (q212), but an LCG is
    *    invertible, so this mode is for testing/audit replay only.
    *  - `seeded = false` (production): a per-release 128-bit salt drawn
    *    from `java.security.SecureRandom` keys a SHA-256 PRF over the
    *    class rank; the top 52 bits of the digest drive the inverse
    *    CDF. A PRF under a fresh cryptographic key is computationally
    *    indistinguishable from fresh randomness, giving the standard
    *    computational-DP instantiation of the mechanism (sensitivity 1
    *    per class for unit-count contribution) — and it stays a
    *    codegen'd column expression, distributed like everything else.
    *
    * Shape at scale: one map-side-combined aggregation to classes; the
    * rank window runs over the vocabulary-sized class table (bounded,
    * never corpus-sized — same post-agg discipline as [[DriftMonitor]]).
    * The LCG stays in exact BIGINT range for any class count below
    * 2^32. NULL class keys are real classes; the rank orders them
    * FIRST (Spark's ascending default, pinned as NULLS FIRST in the
    * q212 oracle) so both engines derive the same gid → same noise. */
  def dpCounts(df: DataFrame, qiCols: Seq[String], epsilon: Double,
      threshold: Double, seeded: Boolean = true): DataFrame = {
    require(qiCols.nonEmpty, "dpCounts needs >= 1 class column")
    require(epsilon > 0, "epsilon must be > 0")
    val b = 1.0 / epsilon
    val classes = df.groupBy(qiCols.map(col(_)): _*)
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(qiCols.map(col(_)): _*)
    val rank = row_number().over(w).cast("long")
    val uC =
      if (seeded)
        ((rank * lit(1103515245L) + lit(12345L)) % lit(2147483648L))
          .cast("double") / lit(2.147483648e9)
      else {
        // fresh 128-bit key per call, SHA-256(key || rank) as the PRF;
        // conv() parses 13 hex chars = 52 bits — exact in a double, so
        // u is uniform on a 2^-52 grid in [0, 1)
        val salt = {
          val bytes = new Array[Byte](16)
          new java.security.SecureRandom().nextBytes(bytes)
          bytes.map("%02x".format(_)).mkString
        }
        conv(substring(sha2(concat_ws("|", lit(salt),
          rank.cast("string")), 256), 1, 13), 16, 10)
          .cast("double") / lit(4.503599627370496e15)
      }
    classes
      .withColumn("__u", uC - lit(0.5))
      .withColumn("__noise",
        lit(-b) * signum(col("__u"))
          * log(greatest(lit(1.0) - lit(2.0) * abs(col("__u")), lit(1e-12))))
      .withColumn("n_noisy",
        graft.functions.Rounding.dround(
          col("__n").cast("double") + col("__noise"), 4))
      .withColumn("released", col("n_noisy") >= threshold)
      .select(qiCols.map(col(_)) :+ col("n_noisy") :+ col("released"): _*)
  }

  /** The externally-publishable DP histogram: [[dpCounts]] restricted
    * to classes whose noisy count cleared the stability threshold, with
    * the audit flag dropped. This is the frame the (ε, δ)-DP proof
    * covers — releasing the full audit view (which names every class)
    * leaks key-domain membership regardless of the noise. */
  def dpRelease(df: DataFrame, qiCols: Seq[String], epsilon: Double,
      threshold: Double, seeded: Boolean = true): DataFrame =
    dpCounts(df, qiCols, epsilon, threshold, seeded)
      .filter(col("released"))
      .drop("released")
}
