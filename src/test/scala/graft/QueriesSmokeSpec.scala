package graft

/** Every catalog query runs on sf0.001 and returns a stable schema;
  * value correctness is the DuckDB oracle's job (tools/check_oracle.py
  * replicates the driver's compare). */
class QueriesSmokeSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and has oracle-aligned columns") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      // queries with an oracle must produce rows at this SF (empty
      // results would make the correctness gate vacuous)
      if (Oracles.all.contains(name)) assert(n > 0, s"$name is empty")
      // type pin: the driver's hash is type-sensitive, so results must
      // stay in the parquet-equivalent type set DuckDB reproduces
      // bit-for-bit (round-6 q140: DuckDB HUGEINT vs Spark BIGINT red
      // row). DecimalType in a Spark result is the mirror-image drift.
      import org.apache.spark.sql.types._
      def drifty(t: DataType): Boolean = t match {
        case _: DecimalType | CalendarIntervalType => true
        case a: ArrayType => drifty(a.elementType)
        case m: MapType => drifty(m.keyType) || drifty(m.valueType)
        case s: StructType => s.fields.exists(f => drifty(f.dataType))
        case _ => false
      }
      df.schema.fields.foreach { f =>
        assert(!drifty(f.dataType),
          s"$name.${f.name} emits ${f.dataType} — not hash-stable " +
            "against the DuckDB oracle; cast to BIGINT/DOUBLE")
      }
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = Oracles.all.keySet -- Queries.all.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("loading events leaves the nanosAsLong conf untouched") {
    // the legacy conf must be scoped to the one scan that needs it —
    // session-wide it would silently read unrelated nanos columns as
    // long
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val df = core.Tables.load(spark, sfDir, "events")
    assert(df.count() > 0)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(spark.conf.getOption(key) == before,
      "events load leaked the nanosAsLong session conf")
  }
}
