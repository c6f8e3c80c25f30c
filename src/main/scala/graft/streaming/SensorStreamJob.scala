package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.{LakeLayout, TableIO}

/** EP3 production wiring (SURVEY.md §2.9): Kafka source → the
  * [[SensorPipeline]] stages → checkpointed parquet sinks, with the
  * reference's parameter surface (--bootstrap/--topic/--run-seconds/
  * --trigger-seconds/--watermark; 07_kafka_smartpool_sensors.py:16-23).
  *
  * The Kafka connector (spark-sql-kafka) is a spark-submit --packages
  * dependency exactly as in the reference's DAG
  * (dags/dag_30_sensors_streaming.py:25-35); this offline environment
  * has no broker, so [[kafkaSource]] is exercised in production and the
  * stages are covered by MemoryStream tests.
  */
object SensorStreamJob {

  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
      maxOffsetsPerTrigger: Long = 2000L,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .option("failOnDataLoss", "false")
      .load()

  /** The notebook topology (the architecturally-correct variant,
    * SURVEY §2.9): 4 queries — bronze raw, silver parsed, gold 1-min
    * agg, gold enriched — each with its own checkpoint dir. */
  def start(spark: SparkSession, layout: LakeLayout, kafka: DataFrame,
      pools: DataFrame, prices: DataFrame,
      triggerSeconds: Int = 10, watermark: String = "2 minutes")
      : Seq[StreamingQuery] = {
    val trigger = Trigger.ProcessingTime(s"$triggerSeconds seconds")
    def sink(df: DataFrame, name: String, partitionCol: String) =
      df.writeStream.format(layout.format)
        .option("checkpointLocation", layout.checkpoints(name))
        .option("path", layout.gold(name))
        .partitionBy(partitionCol)
        .outputMode("append")
        .trigger(trigger)
        .queryName(name)
        .start()

    val bronze = SensorPipeline.bronze(kafka)
    val qBronze = bronze.writeStream.format(layout.format)
      .option("checkpointLocation", layout.checkpoints("bronze_sensors"))
      .option("path", layout.bronze("sensors"))
      .partitionBy("ingest_date")
      .outputMode("append").trigger(trigger)
      .queryName("bronze_sensors").start()

    val silver = SensorPipeline.silver(bronze, watermark)
    val qSilver = silver.writeStream.format(layout.format)
      .option("checkpointLocation", layout.checkpoints("silver_sensors"))
      .option("path", layout.silver("sensors"))
      .partitionBy("event_date")
      .outputMode("append").trigger(trigger)
      .queryName("silver_sensors").start()

    val agg = SensorPipeline.goldMinuteAgg(silver)
    val qAgg = sink(agg, "sensors_minute_agg", "calc_date")
    val enriched = SensorPipeline.goldEnriched(agg, pools, prices)
    val qEnriched = sink(enriched, "sensors_enriched", "calc_date")

    Seq(qBronze, qSilver, qAgg, qEnriched)
  }

  /** Bounded run + graceful reverse-order stop (07:…py:163-171). */
  def runBounded(queries: Seq[StreamingQuery], runSeconds: Int): Unit = {
    Thread.sleep(runSeconds * 1000L)
    queries.reverse.foreach(_.stop())
  }

  /** K6: console debug sink (reference 07_kafka….ipynb §9) — prints
    * each micro-batch to stdout; never a production sink. */
  def consoleSink(df: DataFrame, numRows: Int = 20,
      truncate: Boolean = false, triggerSeconds: Int = 10)
      : StreamingQuery =
    df.writeStream.format("console")
      .option("numRows", numRows.toString)
      .option("truncate", truncate.toString)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(s"$triggerSeconds seconds"))
      .start()

  /** Stream-static join with a PER-BATCH dim refresh (SURVEY §7.4 risk
    * 4): a plain stream-static join against a parquet dim resolves the
    * static side's file listing once at query start, so dim updates
    * made while the stream runs are invisible until restart. foreachBatch
    * re-reads the dim table at every micro-batch — an update lands in
    * the NEXT batch. The dim is broadcast (it is small by contract).
    *
    * Replay idempotence: Structured Streaming re-runs a micro-batch
    * whose write finished but whose checkpoint commit didn't, and a
    * blind append would then duplicate it. A `_graft_batch_commits/<id>`
    * marker written AFTER the append makes the replay a no-op. The
    * residual window (crash between append and marker) duplicates at
    * most one batch — closing it entirely needs a transactional table
    * format, which parquet-mode deliberately doesn't assume. */
  def startWithDimRefresh(stream: DataFrame, layout: LakeLayout,
      dimPath: String, joinKeys: Seq[String], outPath: String,
      checkpointPath: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val marker = new org.apache.hadoop.fs.Path(
          s"$outPath/_graft_batch_commits/$batchId")
        val fs = marker.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          val dim = spark.read.format(layout.format).load(dimPath)
          batch.join(org.apache.spark.sql.functions.broadcast(dim),
              joinKeys, "left")
            .write.format(layout.format)
            .mode(org.apache.spark.sql.SaveMode.Append).save(outPath)
          fs.create(marker, true).close()
        }
      }
      .option("checkpointLocation", checkpointPath)
      .queryName("dim_refresh_sink")
      .start()

  /** Streaming MERGE sink: each micro-batch UPSERTS into the target by
    * key (latest-wins inside the batch, then K4 merge semantics against
    * the table) instead of blind-appending — the streaming twin of the
    * reference's Delta MERGE silver step (03_silver_smartpool.ipynb §4).
    *
    * Replay idempotence is free here, unlike the append sink: re-merging
    * an already-applied batch maps every key to the value it already
    * has, so no commit marker is needed. The swap goes through
    * `TableIO.replaceContents` (tmp-dir write + rename) because the
    * merged frame READS FROM the table it replaces. */
  def startUpsertSink(stream: DataFrame, layout: LakeLayout,
      outPath: String, keys: Seq[String], orderCol: String,
      checkpointPath: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val order = Seq(org.apache.spark.sql.functions.col(orderCol).desc)
        if (!TableIO.exists(spark, outPath)) {
          // create ONLY on the first-ever batch. On any later batch a
          // missing table means state was lost (e.g. a crash between
          // replaceContents' delete and rename) — rebuilding from one
          // micro-batch would silently truncate every prior key, so
          // fail loudly and let the operator restore the table
          if (batchId != 0L) throw new IllegalStateException(
            s"upsert target $outPath missing at batch $batchId — " +
              "refusing to rebuild merged state from a single batch")
          TableIO.overwrite(
            graft.ops.DedupLatest(batch, keys, order), layout, outPath)
        } else {
          val target = TableIO.read(spark, layout, outPath)
          // Upsert dedups its source latest-wins internally
          TableIO.replaceContents(spark, layout,
            graft.ops.Upsert(target, batch, keys, order), outPath)
        }
      }
      .option("checkpointLocation", checkpointPath)
      .queryName("upsert_sink")
      .start()
}
