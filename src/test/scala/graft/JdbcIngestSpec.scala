package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.{IncrementalJdbc, JdbcWatermark}

/** End-to-end S1/S2: the incremental JDBC ingest protocol against a
  * REAL database — embedded Derby (the only JDBC engine in the
  * offline jar set). Replays the reference's incremental scenario
  * (sql-scripts/PRUEBA INCREMENTAL.sql): seed rows → full ingest →
  * new+updated rows → incremental ingest picks up exactly the delta.
  */
class JdbcIngestSpec extends SparkTestBase {

  private val dbUrl = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(dbUrl)
    try { val st = c.createStatement(); st.execute(sql); st.close() }
    finally c.close()
  }

  private def ingest(wm: Option[JdbcWatermark]) = {
    val q = IncrementalJdbc.pushdownQuery("maintenance_events",
      "updated_at", "id", wm, IncrementalJdbc.AnsiCastDialect)
    IncrementalJdbc.read(spark, dbUrl, q)
  }

  test("full then incremental ingest against embedded Derby") {
    exec("""CREATE TABLE maintenance_events (
      id INT PRIMARY KEY, pool_id INT NOT NULL,
      intervention_type VARCHAR(50) NOT NULL,
      updated_at TIMESTAMP NOT NULL)""")
    exec("INSERT INTO maintenance_events VALUES " +
      "(1, 1, 'chlorine', TIMESTAMP('2026-01-05 09:00:00.123456789'))," +
      "(2, 1, 'refill',   TIMESTAMP('2026-01-05 10:00:00'))," +
      "(3, 2, 'chlorine', TIMESTAMP('2026-01-05 10:00:00'))")

    // round 1: full ingest (no watermark)
    val b1 = ingest(None)
    assert(b1.count() == 3)
    val wm1 = IncrementalJdbc.nextWatermark(b1, "updated_at_str", "id",
      None)
    // ties on updated_at are broken by pk: watermark is (max_ts, 3)
    assert(wm1.exists(_.lastPk == 3L))

    // round 2: nothing new → empty, watermark unchanged
    val b2 = ingest(wm1)
    assert(b2.isEmpty)
    assert(IncrementalJdbc.nextWatermark(b2, "updated_at_str", "id",
      wm1) == wm1)

    // the reference's PRUEBA INCREMENTAL scenario: one new row + one
    // update (trigger bumps updated_at)
    exec("INSERT INTO maintenance_events VALUES " +
      "(4, 2, 'ph_correction', TIMESTAMP('2026-01-06 08:00:00'))")
    exec("UPDATE maintenance_events SET intervention_type='refill', " +
      "updated_at=TIMESTAMP('2026-01-06 09:30:00.000000123') " +
      "WHERE id=1")

    val b3 = ingest(wm1)
    val got = b3.select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(1, 4), s"expected exactly the delta, got $got")
    val wm3 = IncrementalJdbc.nextWatermark(b3, "updated_at_str", "id",
      wm1)
    // sub-microsecond fraction survives in the string watermark
    assert(wm3.exists(_.lastUpdatedAtStr.contains("09:30:00.000000123")))

    // round 4: converged again
    assert(ingest(wm3).isEmpty)
  }

  test("partitioned read fans out over N connections, same results") {
    exec("""CREATE TABLE pool_readings (
      id INT PRIMARY KEY, v INT NOT NULL, updated_at TIMESTAMP NOT NULL)""")
    val values = (1 to 97).map(i =>
      s"($i, ${i * 10}, TIMESTAMP('2026-02-01 10:00:00'))")
    exec("INSERT INTO pool_readings VALUES " + values.mkString(","))

    def readPart(wm: Option[JdbcWatermark], n: Int) =
      IncrementalJdbc.readPartitioned(spark, dbUrl, "pool_readings",
        "updated_at", "id", wm, minPk = 1L, maxPk = 97L,
        numPartitions = n, IncrementalJdbc.AnsiCastDialect)

    val part = readPart(None, 4)
    // genuinely 4 JDBC partitions, not one serialized task
    assert(part.rdd.getNumPartitions == 4)
    val ids = part.select("id").collect().map(_.getInt(0)).sorted.toSeq
    // disjoint (no id read twice) AND complete (all 97 present) —
    // matches the single-connection pushdown read exactly
    assert(ids == (1 to 97))
    val single = IncrementalJdbc.read(spark, dbUrl,
      IncrementalJdbc.pushdownQuery("pool_readings", "updated_at", "id",
        None, IncrementalJdbc.AnsiCastDialect))
    assert(single.count() == 97)

    // watermark protocol composes with the stride predicates
    val wm = IncrementalJdbc.nextWatermark(part, "updated_at_str", "id",
      None)
    assert(wm.exists(_.lastPk == 97L))
    assert(readPart(wm, 4).isEmpty)
    // delta: one update + one insert OUTSIDE the sampled pk range —
    // the open-ended edge partition must still catch it
    exec("UPDATE pool_readings SET v=999, " +
      "updated_at=TIMESTAMP('2026-02-02 08:00:00') WHERE id=5")
    exec("INSERT INTO pool_readings VALUES " +
      "(150, 1500, TIMESTAMP('2026-02-02 09:00:00'))")
    val delta = readPart(wm, 4)
    assert(delta.select("id").collect().map(_.getInt(0)).sorted.toSeq
      == Seq(5, 150))
  }
}
