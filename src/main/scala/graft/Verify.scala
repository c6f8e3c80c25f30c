package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter for targeted
    // re-checks at larger SFs (driver always passes 2 args = full dump).
    // Queries whose ORACLE reads a Spark-dumped fixture from this same
    // out dir pull their fixture query in automatically — a filter
    // selecting only q24 would otherwise compare against a missing or
    // stale fixture and silently mis-verify.
    val fixtureDeps = Map(
      "q24_minhash_neardups" -> "q104_minhash_band_fixture",
      "q25_simhash_neardups" -> "q103_simhash_fixture",
      "q30_embedding_neardups" -> "q105_lsh_bucket_fixture",
      "q187_compress_gate" -> "q171_compress_ratio",
      "q196_image_ann_ivf" -> "q192_image_resize")
    val only: Option[Set[String]] =
      if (args.length > 2) {
        val asked = args(2).split(",").toSet
        // a typo must fail loudly, not produce an empty "all green" run
        val unknown = asked -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"unknown query name(s): ${unknown.mkString(", ")} — " +
            s"valid names are in SparkEntry.queries")
        Some(asked ++ asked.flatMap(fixtureDeps.get))
      } else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // __VERIFY_OUT__ → this run's dump dir: lets an oracle read a
    // Spark-dumped hash fixture (q103-q105) with read_parquet and
    // cross-check everything downstream of a non-replicable hash.
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("__VERIFY_OUT__", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
