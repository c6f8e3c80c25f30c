package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-format timestamp parsing chain (SURVEY.md §2.8): the reference
  * coalesces `to_timestamp` attempts over ISO variants, with a
  * regexp-strip-`Z` fallback (reference: notebooks/
  * 07_kafka_smartpool_sensors.ipynb §5; CSV variants in
  * spark-apps/05_ingest_electricity_csv.py:28-46).
  * All built-in expressions → fully codegen'd, no UDF.
  */
object TimeParse {
  val IsoFormats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss")

  /** coalesce(to_timestamp(fmt1), …, to_timestamp(strip Z)) */
  def parseTimestamp(c: Column): Column = {
    val attempts = IsoFormats.map(f => try_to_timestamp(c, lit(f)))
    val stripped = try_to_timestamp(regexp_replace(c, "Z$", ""))
    coalesce((attempts :+ stripped :+ try_to_timestamp(c)): _*)
  }
}
