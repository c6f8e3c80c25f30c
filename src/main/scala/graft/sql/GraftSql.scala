package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** Thin SQL surface (SURVEY.md §2.10: the reference's only `spark.sql`
  * call is DESCRIBE DETAIL — our engine exposes a real SQL entry point):
  * registers the star-schema tables as temp views and the custom
  * Catalyst expressions as SQL functions, then passes queries through
  * to Catalyst.
  *
  * SQL surface:
  *   simhash64(array<string>)            → bigint
  *   minhash_signature(array<string>, k) → array<bigint>
  *   word_shingles(array<string>, n)     → array<string>
  *   hyperplane_lsh(array<float|double>, bits[, seed]) → bigint
  */
object GraftSql {

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.all.foreach(name =>
      Tables.load(spark, sfDir, name).createOrReplaceTempView(name))

  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (name, builder) =>
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
