package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-ingest watermark protocols (SURVEY.md §2.10).
  *
  * The canonical JDBC protocol — (b) in the survey — keeps the watermark
  * as an ISO STRING with full 7-digit fractional seconds plus a primary-key
  * tie-breaker, because the reference lost rows truncating DATETIME2(7)
  * to Spark's µs timestamps (reference: notebooks/02_ingest_smartpool.ipynb
  * §1; ProyectoFinal main.tex:150). We replicate the string protocol
  * exactly: the predicate is built engine-side and pushed to the remote
  * database via the JDBC `query` option, so the database evaluates it at
  * full precision and Spark never parses the boundary timestamp.
  */
final case class JdbcWatermark(lastUpdatedAtStr: String, lastPk: Long)

object IncrementalJdbc {

  /** WHERE clause evaluated on the remote DB at native precision.
    * Reference predicate shape: 02_ingest_smartpool.ipynb §1 —
    * `updated > ts OR (updated = ts AND pk > last_pk)`. */
  def incrementalPredicate(wm: JdbcWatermark, updatedCol: String,
      pkCol: String): String = {
    val ts = wm.lastUpdatedAtStr.replace("'", "''")
    s"($updatedCol > '$ts' OR ($updatedCol = '$ts' AND $pkCol > ${wm.lastPk}))"
  }

  /** How a dialect renders "timestamp column → lossless ISO string".
    * SQL Server is the reference dialect (CONVERT(varchar(33),…,126),
    * 02_ingest_smartpool.ipynb §1); Derby/ANSI uses a plain VARCHAR
    * cast. The string is what the watermark stores, so it must carry
    * the column's full native precision. */
  type TimestampToString = String => String
  val SqlServerDialect: TimestampToString =
    c => s"CONVERT(varchar(33), $c, 126)"
  val AnsiCastDialect: TimestampToString =
    c => s"CAST($c AS VARCHAR(29))"

  /** Pushdown query for the JDBC `query` option: the remote engine
    * evaluates both the watermark predicate and the lossless string
    * conversion at native precision. */
  def pushdownQuery(table: String, updatedCol: String, pkCol: String,
      wm: Option[JdbcWatermark],
      dialect: TimestampToString = SqlServerDialect): String = {
    val base = s"SELECT t.*, ${dialect(updatedCol)} AS " +
      s"${updatedCol}_str FROM $table t"
    wm.fold(base)(w =>
      s"$base WHERE ${incrementalPredicate(w, updatedCol, pkCol)}")
  }

  /** Next watermark from an ingested batch: max (updated_str, pk) pair,
    * compared lexicographically-then-numerically — safe because the string
    * is fixed-width ISO-8601. */
  def nextWatermark(batch: DataFrame, updatedStrCol: String, pkCol: String,
      current: Option[JdbcWatermark]): Option[JdbcWatermark] = {
    val top = batch
      .select(col(updatedStrCol).as("u"), col(pkCol).cast("long").as("p"))
      .orderBy(col("u").desc, col("p").desc)
      .limit(1)
      .collect()
    top.headOption
      .map(r => JdbcWatermark(r.getString(0), r.getLong(1)))
      .orElse(current)
  }

  def read(spark: SparkSession, url: String, query: String,
      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc").option("url", url)
      .option("query", query)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }
}

/** File-ingest incremental state — protocol (c): a `last_date` string in a
  * tiny single-row state table, new hive-style `date=` partitions read
  * selectively (reference: notebooks/05_ingest_electricity_csv.ipynb §2-§4).
  * State lives as a 1-row parquet; overwrite is the commit.
  */
object IncrementalFiles {
  def readState(spark: SparkSession, statePath: String): Option[String] =
    try {
      spark.read.parquet(statePath).select("last_date").collect()
        .headOption.map(_.getString(0))
    } catch { case _: Exception => None }

  def writeState(spark: SparkSession, statePath: String, lastDate: String)
      : Unit = {
    import spark.implicits._
    Seq(lastDate).toDF("last_date")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(statePath)
  }

  /** Read partitions at-or-after the state date. `>=` (not `>`): files
    * can keep landing into the current date's partition after a run has
    * ingested it — a strict comparison would skip them forever. The
    * boundary partition is re-read instead, and silver's latest-wins
    * dedup makes the re-ingest idempotent. The partition-column
    * comparison prunes directories at planning time
    * (PruneFileSourcePartitions) — no data files behind older `date=`
    * dirs are opened, which is what keeps this O(new-data) at 100 TB. */
  def readNew(spark: SparkSession, landingRoot: String,
      lastDate: Option[String], format: String = "csv"): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("basePath", landingRoot)
      .format(format)
      .load(landingRoot)
    lastDate.fold(base)(d => base.filter(col("date") >= lit(d)))
  }
}
