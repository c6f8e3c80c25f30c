package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Thin SQL surface (SURVEY.md §2.10: the reference's only `spark.sql`
  * call is DESCRIBE DETAIL — our engine exposes a real SQL entry point):
  * registers the star-schema tables as temp views and the custom
  * Catalyst expressions as SQL functions, then passes queries through
  * to Catalyst.
  *
  * SQL surface: every entry of [[GraftExtensions.functions]] — the
  * dedup/ANN expressions (simhash64, minhash_signature, word_shingles,
  * hyperplane_lsh, cosine_sim), the bounded-heap top-k aggregate, the
  * mergeable count-min and GK-quantile sketches, and the media
  * byte-parsers/decoders (media_header, bmp_pixel_stats,
  * wav_pcm_stats, png_pixel_stats, gunzip, gunzip_text). The
  * single builder table keeps this path and the cluster-wide
  * `spark.sql.extensions` path from drifting.
  */
object GraftSql {

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.all.foreach(name =>
      Tables.load(spark, sfDir, name).createOrReplaceTempView(name))

  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (name, builder) =>
      // idempotent: skip names already present (earlier call on this
      // session, or the cluster-wide extensions path) — re-registering
      // logs a "replaced a previously registered function" warning per
      // name per call, which a 131-query bench run turns into noise
      val id = new org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** One-call setup + passthrough. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerTables(spark, sfDir)
    registerFunctions(spark)
    spark.sql(query)
  }
}
