package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.core.Tables
import graft.functions.{HyperplaneLsh, MinHashSignature, SimHash64, WordShingles}

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

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      exprs => MinHashSignature(exprs(0), intArg(exprs(1), "k")),
      "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs(0), intArg(exprs(1), "n")),
      "built-in")
    reg.createOrReplaceTempFunction("hyperplane_lsh",
      exprs => HyperplaneLsh(exprs(0), intArg(exprs(1), "bits"),
        if (exprs.length > 2) intArg(exprs(2), "seed") else 42),
      "built-in")
  }

  /** One-call setup + passthrough. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerTables(spark, sfDir)
    registerFunctions(spark)
    spark.sql(query)
  }
}
