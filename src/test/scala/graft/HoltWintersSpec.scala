package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HoltWinters

/** Holt-Winters additive seasonal aggregate (q195): exact sequential
  * fold vs the recurrence, seasonal tracking of a periodic signal,
  * null carry without advancing the cycle, refusal, bounds. */
class HoltWintersSpec extends SparkTestBase {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def run(rows: Seq[(String, Int, java.lang.Double)],
                  a: Double, b: Double, g: Double, m: Int) =
    rows.toDF("k", "t", "v")
      .repartition(4)
      .withColumn("h", HoltWinters.holtWinters($"v", a, b, g, m).over(w))
      .select($"k", $"t", $"h.level", $"h.trend", $"h.seasonal",
        $"h.forecast")
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

  /** reference fold, same parenthesization as the update expressions */
  private def reference(xs: Seq[Double], a: Double, b: Double, g: Double,
      m: Int): Seq[(Double, Double, Double, Double)] = {
    var l = Double.NaN; var tr = 0.0
    val seas = Array.fill(m)(0.0)
    var n = 0
    xs.map { x =>
      if (l.isNaN) { l = x; tr = 0.0; n = 1 }
      else {
        val sm = seas(n % m)
        val l2 = a * (x - sm) + (1 - a) * (l + tr)
        tr = b * (l2 - l) + (1 - b) * tr
        seas(n % m) = g * (x - l2) + (1 - g) * sm
        l = l2; n += 1
      }
      (l, tr, seas((n - 1) % m), l + tr + seas(n % m))
    }
  }

  test("fold matches the recurrence bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(String, Int, java.lang.Double)] =
      for (k <- 0 until 3; i <- 0 until 50)
        yield (s"k$k", i, Double.box(rnd.nextInt(500) / 7.0))
    val out = run(rows, a = 0.4, b = 0.2, g = 0.3, m = 6)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val sorted = rs.sortBy(_._2)
      val exp = reference(sorted.map(_._3.doubleValue()), 0.4, 0.2, 0.3, 6)
      sorted.map(_._2).zip(exp).foreach { case (t, e) =>
        assert(out((k, t)) == e, s"($k, $t)")
      }
    }
  }

  test("a pure m-periodic signal is absorbed into the seasonal cycle") {
    // x_t = 100 + pattern(t mod 4): after warmup level ≈ 100 + mean
    // deviation, trend ≈ 0, and forecast tracks the next period's value
    val pat = Seq(10.0, -5.0, 0.0, -5.0)
    val rows: Seq[(String, Int, java.lang.Double)] =
      (0 until 200).map(i => ("p", i, Double.box(100.0 + pat(i % 4))))
    val out = run(rows, a = 0.3, b = 0.1, g = 0.4, m = 4)
    val (_, trend, _, forecast) = out(("p", 199))
    assert(math.abs(trend) < 1e-3, s"trend $trend")
    // next observation is t=200 → pattern slot 0 → 110
    assert(math.abs(forecast - 110.0) < 0.05, s"forecast $forecast")
  }

  test("null values carry all state without advancing the cycle") {
    val rows: Seq[(String, Int, java.lang.Double)] = Seq(
      ("a", 1, Double.box(10.0)), ("a", 2, null),
      ("a", 3, Double.box(20.0)))
    val out = run(rows, a = 0.5, b = 0.5, g = 0.5, m = 3)
    assert(out(("a", 2)) == out(("a", 1)))
    // the 20.0 lands in slot 1 (second observation), not slot 2
    val exp = reference(Seq(10.0, 20.0), 0.5, 0.5, 0.5, 3)
    assert(out(("a", 3)) == exp(1))
  }

  test("groupBy use raises instead of folding shuffle order") {
    val err = intercept[Exception] {
      Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
        .groupBy($"k")
        .agg(HoltWinters.holtWinters($"v", 0.5, 0.5, 0.5, 4).as("h"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("ordered window")),
      s"unexpected error: $err")
  }

  test("parameter bounds are validated") {
    def mk(a: Double, b: Double, g: Double, m: Int) =
      graft.functions.HoltWintersAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), a, b, g, m)
    intercept[IllegalArgumentException] { mk(0.0, 0.5, 0.5, 4) }
    intercept[IllegalArgumentException] { mk(0.5, 1.5, 0.5, 4) }
    intercept[IllegalArgumentException] { mk(0.5, 0.5, -0.1, 4) }
    intercept[IllegalArgumentException] { mk(0.5, 0.5, 0.5, 1) }
  }
}
