package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Kalman

/** Local-level Kalman filter aggregate (q207): exact sequential fold,
  * adaptive-gain semantics, steady-state convergence, null carry,
  * refusal. */
class KalmanSpec extends SparkTestBase {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def run(rows: Seq[(String, Int, java.lang.Double)],
                  q: Double, r: Double) =
    rows.toDF("k", "t", "v")
      .repartition(4)
      .withColumn("f", Kalman.kalman($"v", q, r).over(w))
      .select($"k", $"t", $"f.estimate", $"f.variance", $"f.gain")
      .collect()
      .map(row => ((row.getString(0), row.getInt(1)),
        (row.getDouble(2), row.getDouble(3), row.getDouble(4))))
      .toMap

  test("fold matches the recurrence bit-for-bit") {
    val rnd = new scala.util.Random(23)
    val rows: Seq[(String, Int, java.lang.Double)] =
      for (k <- 0 until 3; i <- 0 until 40)
        yield (s"k$k", i, Double.box(rnd.nextInt(500) / 7.0))
    val out = run(rows, q = 0.25, r = 4.0)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var xh = Double.NaN; var p = 0.0; var g = 0.0
      rs.sortBy(_._2).foreach { case (_, t, z) =>
        if (xh.isNaN) { xh = z; p = 4.0; g = 0.0 }
        else {
          // pinned parenthesization, old buffer throughout
          val pm = p + 0.25
          val kk = pm / (pm + 4.0)
          val xh2 = xh + kk * (z - xh)
          p = (1.0 - kk) * pm
          g = kk
          xh = xh2
        }
        assert(out((k, t)) == ((xh, p, g)), s"($k, $t)")
      }
    }
  }

  test("gain starts high after the seed and converges to steady state") {
    val rows: Seq[(String, Int, java.lang.Double)] =
      (0 until 60).map(i => ("s", i, Double.box(100.0 + (i % 2))))
    val out = run(rows, q = 0.25, r = 4.0)
    val early = out(("s", 1))._3
    val late = out(("s", 59))._3
    // steady-state gain for Q=0.25, R=4: K* = P*/(P*+R) with
    // P* = (1-K*)(P*+Q) -> K* = (sqrt(Q²+4QR)-Q)/(2R) ≈ 0.2215
    val kStar = (math.sqrt(0.25 * 0.25 + 4 * 0.25 * 4.0) - 0.25) / 8.0
    assert(early > late, s"gain must decay: $early -> $late")
    assert(math.abs(late - kStar) < 1e-6, s"late gain $late vs $kStar")
  }

  test("a constant signal keeps the estimate exact") {
    val rows: Seq[(String, Int, java.lang.Double)] =
      (0 until 20).map(i => ("c", i, Double.box(42.0)))
    val out = run(rows, q = 0.5, r = 2.0)
    assert(out(("c", 19))._1 == 42.0)
  }

  test("null values carry all state") {
    val rows: Seq[(String, Int, java.lang.Double)] = Seq(
      ("a", 1, Double.box(10.0)), ("a", 2, null), ("a", 3, Double.box(20.0)))
    val out = run(rows, q = 0.25, r = 4.0)
    assert(out(("a", 2)) == ((10.0, 4.0, 0.0)))
    val pm = 4.0 + 0.25
    val kk = pm / (pm + 4.0)
    assert(out(("a", 3)) ==
      ((10.0 + kk * 10.0, (1.0 - kk) * pm, kk)))
  }

  test("groupBy use raises instead of folding shuffle order") {
    val err = intercept[Exception] {
      Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
        .groupBy($"k").agg(Kalman.kalman($"v", 0.25, 4.0).as("f"))
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
      graft.functions.KalmanAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), 0.0, 1.0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.KalmanAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), 1.0, -1.0)
    }
  }
}
