package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines and ORC corpus ingestion — the two interchange formats a
  * training-data pipeline meets beyond parquet/CSV/JDBC (reference
  * anchor: the smartpool repo ingests CSV and JDBC; LLM corpora
  * overwhelmingly arrive as JSONL shards, and ORC is the other
  * columnar lake format a migrating user brings).
  *
  * Design rules for 100 TB ingestion, both enforced here:
  *
  *  - EXPLICIT schema, never inference: `spark.read.json` without a
  *    schema runs a full extra pass over every byte just to guess
  *    types (and guesses per-run, so a new shard can silently flip a
  *    column's type). Callers pass the schema; a missing field reads
  *    as null, an extra field is ignored — exactly the
  *    forward/backward-compatible contract JSONL shards need.
  *  - Malformed records are CAPTURED, not dropped or fatal:
  *    PERMISSIVE mode with a named corrupt-record column. A bad shard
  *    in a 100k-shard crawl must neither kill the job (FAILFAST) nor
  *    vanish silently (DROPMALFORMED); it lands in quarantine
  *    ([[badRecords]]) where a data-quality gate counts it.
  *
  * ORC reads go through Spark's native vectorized reader — predicate
  * pushdown and column pruning work exactly as for parquet (asserted
  * in `TextFormatsSpec`'s plan test). */
object TextFormats {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL at `path` under an explicit `schema`. The returned
    * frame carries [[CorruptCol]]: null for clean rows, the raw line
    * for malformed ones (parse the frame once, split clean/quarantine
    * with two filters — one scan under whole-stage codegen).
    *
    * Implementation: a text scan + `from_json` rather than the JSON
    * datasource, for two reasons. (1) Spark disallows queries that
    * reference only the datasource's internal corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
    * exactly what a quarantine count does; the suggested workaround is
    * caching the parsed frame — wrong at 100 TB. (2) The text scan
    * keeps the raw line in hand, so a WHOLE-LINE failure (not valid
    * JSON at all) quarantines the verbatim line, while a field-level
    * failure (valid JSON, one field of the wrong type) quarantines
    * what the PERMISSIVE parser captured. Cost shape is identical:
    * one file scan, one codegen'd parse per line. */
  def readJsonLines(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    parseLines(spark.read.text(path), schema)

  /** STREAMING JSONL ingestion — the crawl-shard arrival shape: new
    * shard files land in `dir`, each micro-batch parses only the new
    * files (Spark's file-stream source tracks seen files in the
    * checkpoint), under the same explicit-schema + quarantine contract
    * as [[readJsonLines]]. Compose with [[graft.core.VersionedTable
    * .foreachBatchAppend]] for exactly-once landing in the lake, and
    * split good/quarantine inside the batch. `maxFilesPerTrigger`
    * bounds a catch-up burst (a backlog of 100k shards must not
    * become one giant first batch). */
  def streamJsonLines(spark: SparkSession, dir: String,
      schema: StructType, maxFilesPerTrigger: Int = 1000): DataFrame =
    parseLines(
      spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(dir),
      schema)

  /** The shared parse: `value: string` lines → schema fields +
    * [[CorruptCol]]. */
  private def parseLines(lines: DataFrame, schema: StructType)
      : DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType)
    val parseOpts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol)
    val cols: Seq[Column] =
      schema.fieldNames.toSeq.map(f => col(s"__j.`$f`")) :+
        coalesce(col(s"__j.`$CorruptCol`"),
          when(col("__j").isNull, col("value"))).as(CorruptCol)
    lines
      .select(from_json(col("value"), withCorrupt, parseOpts)
        .as("__j"), col("value"))
      .select(cols: _*)
  }

  /** Clean rows of a [[readJsonLines]] frame, corrupt column dropped. */
  def goodRecords(parsed: DataFrame): DataFrame =
    parsed.filter(parsed(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantine: the raw text of every malformed line. */
  def badRecords(parsed: DataFrame): DataFrame =
    parsed.filter(parsed(CorruptCol).isNotNull).select(CorruptCol)

  /** Write `df` as JSONL shards at `path` (one JSON object per line;
    * Spark escapes newlines/quotes/unicode, so free-text columns
    * round-trip byte-exactly — q183 hash-checks this). */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read ORC at `path`. Schema comes from the ORC footer (ORC is
    * self-describing like parquet — no inference pass). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Write `df` as ORC at `path`. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
