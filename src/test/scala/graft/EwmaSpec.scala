package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ewma

/** Native EWMA aggregate (q190): exact sequential fold over a running
  * window frame, null-gap carry, and the loud groupBy refusal. */
class EwmaSpec extends SparkTestBase {
  import spark.implicits._

  private val w = Window.partitionBy($"k").orderBy($"t")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  test("window fold matches the sequential recurrence bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- 0 until 4; i <- 0 until 50)
      yield (s"k$k", i, rnd.nextInt(1000) / 7.0)
    val out = rows.toDF("k", "t", "v")
      .repartition(8) // fold order must come from the frame, not input order
      .withColumn("e", Ewma.ewma($"v", 0.25).over(w))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getDouble(3)))
      .toMap
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      rs.sortBy(_._2).scanLeft(("", -1, Double.NaN)) { case ((_, _, s), (_, t, x)) =>
        (k, t, if (s.isNaN) x else 0.25 * x + 0.75 * s)
      }.drop(1)
    }
    expected.foreach { case (k, t, e) => assert(out((k, t)) == e) }
  }

  test("null values carry the previous state without resetting") {
    val out = Seq(("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, Some(20.0)))
      .toDF("k", "t", "v")
      .withColumn("e", Ewma.ewma($"v", 0.5).over(w))
      .collect().map(r => (r.getInt(1), Option(r.get(3)))).sortBy(_._1).toSeq
    // t=2 keeps 10.0; t=3 folds FROM 10.0 (one step, not two)
    assert(out == Seq((1, Some(10.0)), (2, Some(10.0)), (3, Some(15.0))))
  }

  test("leading nulls leave the state null until the first value") {
    val out = Seq(("a", 1, None), ("a", 2, Some(4.0)))
      .toDF("k", "t", "v")
      .withColumn("e", Ewma.ewma($"v", 0.5).over(w))
      .collect().map(r => (r.getInt(1), Option(r.get(3)))).sortBy(_._1).toSeq
    assert(out == Seq((1, None), (2, Some(4.0))))
  }

  test("groupBy use raises instead of folding shuffle order") {
    val err = intercept[Exception] {
      Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
        .groupBy($"k").agg(Ewma.ewma($"v", 0.5).as("e"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("ordered window")),
      s"unexpected error: $err")
  }

  test("alpha bounds are validated") {
    intercept[IllegalArgumentException] {
      graft.functions.EwmaAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.EwmaAgg(
        org.apache.spark.sql.GraftBridge.expression(lit(1.0)), 1.5)
    }
  }
}
