package graft

import org.apache.spark.sql.functions._

import graft.ops.ZOrder

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zvalue interleaves bits (hand-checked)") {
    // x=3 (bits 1,1 -> positions 0,2 = 5); y=5 (bits 1,0,1 ->
    // positions 1,5 = 34); z = 39
    val z = Seq((3, 5)).toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].head()
    assert(z == 39L)
  }

  test("zvalue of zero is zero; single column is identity") {
    val df = Seq((0, 0)).toDF("x", "y")
    assert(df.select(ZOrder.zvalue(Seq(col("x"), col("y")), 8))
      .as[Long].head() == 0L)
    assert(Seq(Tuple1(173)).toDF("x")
      .select(ZOrder.zvalue(Seq(col("x")), 8)).as[Long].head() == 173L)
  }

  test("z-order layout localizes 2D box queries; 1D layout does not") {
    // 256x256 uniform grid -> 64 range partitions
    val df = spark.range(0, 65536).select(
      (col("id") / 256).cast("int").as("x"),
      (col("id") % 256).cast("int").as("y"))
    val zLaid = ZOrder.layout(df, Seq("x", "y"), 64, 8).cache()
    val xLaid = df.repartitionByRange(64, col("x")).cache()

    def touched(laid: org.apache.spark.sql.DataFrame,
        cond: org.apache.spark.sql.Column): Long =
      laid.filter(cond).select(spark_partition_id()).distinct().count()

    // 8x8 box: z-order confines it to a handful of tiles
    val box = col("x").between(100, 107) && col("y").between(50, 57)
    assert(touched(zLaid, box) <= 12)

    // y-only predicate: x-range layout must scan every partition,
    // z-order still skips ~7/8 of them
    val yOnly = col("y").between(50, 57)
    val zTouched = touched(zLaid, yOnly)
    val xTouched = touched(xLaid, yOnly)
    assert(zTouched <= 24, s"z-order touched $zTouched of 64")
    assert(xTouched >= 48, s"x-range layout should touch ~all, got $xTouched")
    zLaid.unpersist(); xLaid.unpersist()
  }

  test("clusterTable: OPTIMIZE ZORDER BY on a versioned table " +
    "prunes files on every clustered column, content identical") {
    import graft.core.{ManifestStats, VersionedTable}
    val root = java.nio.file.Files
      .createTempDirectory("zorderopt").toString
    graft.core.Scratch.registerForCleanup(root)
    val t = s"$root/t"
    // unclustered layout: x/y interleave across all files
    val df = spark.range(0, 16384).select(
      col("id").as("id"),
      (col("id") / 128).cast("int").as("x"),
      (col("id") % 128).cast("int").as("y"))
    VersionedTable.commitAppend(df.repartition(16), t)
    val v = ZOrder.clusterTable(spark, t, Seq("x", "y"),
      partitions = 16, bitsPerCol = 8)
    assert(v === 2)
    // content identical across versions
    assert(VersionedTable.read(spark, t, Some(2))
      .agg(count(lit(1)), sum(col("id"))).collect().head.toSeq ===
      VersionedTable.read(spark, t, Some(1))
        .agg(count(lit(1)), sum(col("id"))).collect().head.toSeq)
    // pruning effectiveness: an 8-value slice of EITHER interleaved
    // column touches a strict subset of the clustered files (typed
    // envelope compare — the stringified manifest is lexical, which
    // for unpadded ints is only caller-correct with padded probes)
    val total = VersionedTable.files(spark, t, Some(2)).size
    val manifest = ManifestStats.buildFiles(spark,
      VersionedTable.files(spark, t, Some(2)), Seq("x", "y"))
    def filesFor(c: String): Int = {
      // integer envelopes: compare numerically via a typed rebuild
      val rows = manifest.filter(col("col_name") === c).collect()
      rows.count { r =>
        val mn = r.getAs[String]("min_value").toInt
        val mx = r.getAs[String]("max_value").toInt
        !(mx < 40 || mn > 47)
      }
    }
    assert(filesFor("x") < total, s"x slice kept all $total files")
    assert(filesFor("y") < total, s"y slice kept all $total files")
  }
}
