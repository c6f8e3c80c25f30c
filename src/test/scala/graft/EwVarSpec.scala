package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.EwVar

/** Exponentially-weighted mean/variance aggregate (q200): exact
  * sequential fold, variance semantics on constant and shifting
  * signals, null carry, refusal. */
class EwVarSpec extends SparkTestBase {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def run(rows: Seq[(String, Int, java.lang.Double)], a: Double) =
    rows.toDF("k", "t", "v")
      .repartition(4)
      .withColumn("e", EwVar.ewvar($"v", a).over(w))
      .select($"k", $"t", $"e.mean", $"e.var")
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getDouble(2), r.getDouble(3))))
      .toMap

  test("fold matches the recurrence bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val rows: Seq[(String, Int, java.lang.Double)] =
      for (k <- 0 until 3; i <- 0 until 40)
        yield (s"k$k", i, Double.box(rnd.nextInt(500) / 7.0))
    val out = run(rows, a = 0.2)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var m = Double.NaN; var s2 = 0.0
      rs.sortBy(_._2).foreach { case (_, t, x) =>
        if (m.isNaN) { m = x; s2 = 0.0 }
        else {
          // the PINNED parenthesization: Δ·(α·Δ), then m last so the
          // variance update reads the pre-step mean
          val d = x - m
          s2 = 0.8 * (s2 + d * (0.2 * d))
          m = m + 0.2 * d
        }
        assert(out((k, t)) == ((m, s2)), s"($k, $t)")
      }
    }
  }

  test("a constant signal keeps mean exact and variance at zero") {
    val rows: Seq[(String, Int, java.lang.Double)] =
      (0 until 20).map(i => ("c", i, Double.box(42.0)))
    val out = run(rows, a = 0.3)
    assert(out(("c", 19)) == ((42.0, 0.0)))
  }

  test("a level shift inflates variance then decays back") {
    // 30 points at 10, then 30 at 50: variance spikes at the shift
    // and decays as the mean re-converges
    val rows: Seq[(String, Int, java.lang.Double)] =
      (0 until 60).map(i => ("s", i, Double.box(if (i < 30) 10.0 else 50.0)))
    val out = run(rows, a = 0.3)
    val before = out(("s", 29))._2
    val atShift = out(("s", 30))._2
    val settled = out(("s", 59))._2
    assert(before < 1e-9, s"pre-shift var $before")
    assert(atShift > 100.0, s"shift var $atShift")
    assert(settled < atShift / 10, s"settled var $settled")
    assert(math.abs(out(("s", 59))._1 - 50.0) < 1e-3)
  }

  test("null values carry both states") {
    val rows: Seq[(String, Int, java.lang.Double)] = Seq(
      ("a", 1, Double.box(10.0)), ("a", 2, null), ("a", 3, Double.box(20.0)))
    val out = run(rows, a = 0.5)
    assert(out(("a", 2)) == ((10.0, 0.0)))
    val d = 20.0 - 10.0
    assert(out(("a", 3)) == ((10.0 + 0.5 * d, 0.5 * (0.0 + d * (0.5 * d)))))
  }

  test("groupBy use raises instead of folding shuffle order") {
    val err = intercept[Exception] {
      Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
        .groupBy($"k").agg(EwVar.ewvar($"v", 0.5).as("e"))
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
      graft.functions.EwVarAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.EwVarAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), 1.5)
    }
  }
}
