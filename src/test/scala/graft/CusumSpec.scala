package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cusum

/** Two-sided CUSUM aggregate (q191): exact sequential fold, drift
  * detection semantics, null-gap carry, and the groupBy refusal. */
class CusumSpec extends SparkTestBase {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def run(rows: Seq[(String, Int, java.lang.Double)],
                  mu: Double, slack: Double) =
    rows.toDF("k", "t", "v")
      .repartition(5)
      .withColumn("c", Cusum.cusum($"v", mu, slack).over(w))
      .select($"k", $"t", $"c.s_pos", $"c.s_neg")
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getDouble(2), r.getDouble(3))))
      .toMap

  test("fold matches the recurrence bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val rows: Seq[(String, Int, java.lang.Double)] =
      for (k <- 0 until 3; i <- 0 until 60)
        yield (s"k$k", i, Double.box(rnd.nextInt(200) / 1.0))
    val out = run(rows, mu = 100.0, slack = 10.0)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var sp = 0.0; var sn = 0.0
      rs.sortBy(_._2).foreach { case (_, t, x) =>
        sp = math.max(0.0, sp + ((x - 100.0) - 10.0))
        sn = math.max(0.0, sn + ((100.0 - x) - 10.0))
        assert(out((k, t)) == ((sp, sn)))
      }
    }
  }

  test("a sustained upward shift raises only the positive side") {
    // ten in-control points, then ten points 30 above target: s_pos
    // accumulates (30 - slack) per step, s_neg stays pinned at 0
    val rows: Seq[(String, Int, java.lang.Double)] =
      (0 until 10).map(i => ("a", i, Double.box(50.0))) ++
        (10 until 20).map(i => ("a", i, Double.box(80.0)))
    val out = run(rows, mu = 50.0, slack = 5.0)
    assert(out(("a", 9)) == ((0.0, 0.0)))
    assert(out(("a", 19)) == ((250.0, 0.0))) // 10 steps x (30 - 5)
  }

  test("null values carry both statistics") {
    val rows: Seq[(String, Int, java.lang.Double)] = Seq(
      ("a", 1, Double.box(120.0)), ("a", 2, null), ("a", 3, Double.box(120.0)))
    val out = run(rows, mu = 100.0, slack = 0.0)
    assert(out(("a", 2)) == ((20.0, 0.0)))
    assert(out(("a", 3)) == ((40.0, 0.0)))
  }

  test("groupBy use raises instead of folding shuffle order") {
    val err = intercept[Exception] {
      Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
        .groupBy($"k").agg(Cusum.cusum($"v", 0.0, 0.0).as("c"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("ordered window")),
      s"unexpected error: $err")
  }

  test("slack bounds are validated") {
    intercept[IllegalArgumentException] {
      graft.functions.CusumAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), 0.0, -1.0)
    }
  }
}
