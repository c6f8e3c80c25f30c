package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join: the large (skewed) side gets a salt in
  * [0, salt) derived per-row, the small side is replicated `salt` times,
  * and the join key becomes (keys…, salt) — a hot key's rows spread over
  * `salt` reducers instead of one straggler task.
  *
  * AQE's skew-join splitting (on by default in our sessions) handles
  * most cases at runtime; explicit salting remains the tool when a
  * single key exceeds what one task can hold even after AQE splits, or
  * when the join is feeding a further keyed operation that AQE cannot
  * rebalance. Any salt value is correct for any row, so the per-row
  * salt only needs distribution, not determinism across retries.
  */
object SaltedJoin {

  private val SaltSafeJoins =
    Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")

  def apply(large: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    // right/full outer would emit one null-padded row PER SALT for
    // unmatched small-side keys — only large-side-preserving joins
    // are salt-safe
    require(SaltSafeJoins.contains(joinType.toLowerCase),
      s"joinType '$joinType' is not salt-safe (small side is replicated)")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*),
        lit(salt.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
