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
}
