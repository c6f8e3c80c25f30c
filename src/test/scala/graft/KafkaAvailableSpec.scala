package graft

/** S5 (Kafka stream scan) self-healing probe: the one §2 component
  * without a passing signal in this sandbox (no broker, no
  * spark-sql-kafka jars). This spec keeps the claim HONEST both ways:
  *
  *  - today it asserts the graceful-skip path — the connector jars are
  *    genuinely absent, `kafkaSource` builds its unresolved plan
  *    without touching the network, and starting it fails with the
  *    stock "Failed to find data source: kafka" guidance (not an NPE,
  *    not a hang);
  *  - the moment the environment grows the jars AND a reachable broker
  *    (`GRAFT_KAFKA_BOOTSTRAP`), the real-roundtrip test un-cancels
  *    and exercises the scan end-to-end — the `untested` row heals
  *    itself with zero code changes.
  */
class KafkaAvailableSpec extends SparkTestBase {

  private def kafkaClassPresent: Boolean =
    try {
      Class.forName(
        "org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  private def bootstrap: Option[String] =
    sys.env.get("GRAFT_KAFKA_BOOTSTRAP").filter(_.nonEmpty)

  test("without connector jars, the kafka source fails loudly and fast") {
    assume(!kafkaClassPresent,
      "connector present — the roundtrip test covers this env")
    // source RESOLUTION is eager (readStream.load looks the provider
    // up immediately): it must fail right there with Spark's dedicated
    // kafka-deployment guidance, not a hang or a downstream NPE
    val e = intercept[Exception] {
      graft.streaming.SensorStreamJob.kafkaSource(
        spark, "localhost:9092", "sensors")
    }
    def msgs(t: Throwable): Seq[String] = Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("kafka") || m.contains("KAFKA")),
      s"expected a kafka data-source lookup failure, got: $e")
  }

  test("with a broker, the kafka scan round-trips (self-healing S5)") {
    assume(kafkaClassPresent, "no spark-sql-kafka jars in this env")
    assume(bootstrap.isDefined, "set GRAFT_KAFKA_BOOTSTRAP to enable")
    val df = graft.streaming.SensorStreamJob.kafkaSource(
      spark, bootstrap.get, "graft_probe", startingOffsets = "earliest")
    val q = df.selectExpr("CAST(value AS STRING) AS v")
      .writeStream.format("memory").queryName("kafka_roundtrip").start()
    try {
      q.processAllAvailable()
      // reaching here proves the scan resolved, connected, and read
      // offsets; topic contents are environment-owned, so only the
      // machinery is asserted
      assert(spark.table("kafka_roundtrip").columns.sameElements(
        Array("v")))
    } finally q.stop()
  }
}
