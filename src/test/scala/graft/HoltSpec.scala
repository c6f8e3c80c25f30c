package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Holt

/** Holt linear-trend aggregate (q194): exact sequential fold, trend
  * semantics on constant and linear signals, null carry, refusal. */
class HoltSpec extends SparkTestBase {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def run(rows: Seq[(String, Int, java.lang.Double)],
                  a: Double, b: Double) =
    rows.toDF("k", "t", "v")
      .repartition(4)
      .withColumn("h", Holt.holt($"v", a, b).over(w))
      .select($"k", $"t", $"h.level", $"h.trend")
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getDouble(2), r.getDouble(3))))
      .toMap

  test("fold matches the recurrence bit-for-bit") {
    val rnd = new scala.util.Random(5)
    val rows: Seq[(String, Int, java.lang.Double)] =
      for (k <- 0 until 3; i <- 0 until 40)
        yield (s"k$k", i, Double.box(rnd.nextInt(500) / 7.0))
    val out = run(rows, a = 0.4, b = 0.3)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var s = Double.NaN; var tr = 0.0
      rs.sortBy(_._2).foreach { case (_, t, x) =>
        if (s.isNaN) { s = x; tr = 0.0 }
        else {
          val s2 = 0.4 * x + 0.6 * (s + tr)
          tr = 0.3 * (s2 - s) + 0.7 * tr
          s = s2
        }
        assert(out((k, t)) == ((s, tr)), s"($k, $t)")
      }
    }
  }

  test("a constant signal keeps level exact and trend at zero") {
    val rows: Seq[(String, Int, java.lang.Double)] =
      (0 until 20).map(i => ("c", i, Double.box(42.0)))
    val out = run(rows, a = 0.4, b = 0.3)
    assert(out(("c", 19)) == ((42.0, 0.0)))
  }

  test("a linear ramp converges the trend to the slope") {
    // x_t = 10 + 3t: after warmup the slope estimate approaches 3
    val rows: Seq[(String, Int, java.lang.Double)] =
      (0 until 60).map(i => ("l", i, Double.box(10.0 + 3.0 * i)))
    val (_, trend) = run(rows, a = 0.5, b = 0.5)(("l", 59))
    assert(math.abs(trend - 3.0) < 1e-6, trend)
  }

  test("null values carry both states") {
    val rows: Seq[(String, Int, java.lang.Double)] = Seq(
      ("a", 1, Double.box(10.0)), ("a", 2, null), ("a", 3, Double.box(20.0)))
    val out = run(rows, a = 0.5, b = 0.5)
    assert(out(("a", 2)) == ((10.0, 0.0)))
    val s2 = 0.5 * 20.0 + 0.5 * (10.0 + 0.0)
    assert(out(("a", 3)) == ((s2, 0.5 * (s2 - 10.0) + 0.5 * 0.0)))
  }

  test("groupBy use raises instead of folding shuffle order") {
    val err = intercept[Exception] {
      Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
        .groupBy($"k").agg(Holt.holt($"v", 0.5, 0.5).as("h"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("ordered window")),
      s"unexpected error: $err")
  }

  test("parameter bounds are validated") {
    intercept[IllegalArgumentException] {
      graft.functions.HoltAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), 0.0, 0.5)
    }
    intercept[IllegalArgumentException] {
      graft.functions.HoltAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), 0.5, 1.5)
    }
  }
}
