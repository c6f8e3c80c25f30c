package graft

import org.apache.spark.sql.SparkSession

/** The injected optimizer rule that turns plain-SQL point-in-interval
  * joins into bucketed equi-joins (graft.plans.RangeJoinRewrite).
  * Needs its own session: extensions apply at session build time. */
class RangeJoinRewriteSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def withSession(f: SparkSession => Unit): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-rangejoin-test")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(spark) finally spark.stop()
  }

  private def setup(spark: SparkSession): Unit = {
    import spark.implicits._
    // points 0..999; intervals of width ~50, some negative, some null
    (0L until 1000L).map(i => (i, i % 7)).toDF("x", "tag")
      .createOrReplaceTempView("pts")
    def L(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    Seq[(java.lang.Long, java.lang.Long, String)](
      (L(-100), L(-50), "neg"), (L(0), L(49), "a"), (L(25), L(99), "b"),
      (L(500), L(549), "c"), (L(990), L(2000), "tail"),
      (null, L(10), "nulllo"))
      .toDF("lo", "hi", "name")
      .createOrReplaceTempView("iv")
  }

  private val sql =
    """SELECT x, tag, name FROM pts JOIN iv
      |ON x >= lo AND x <= hi""".stripMargin

  test("rewritten range join matches the nested-loop result exactly") {
    withSession { spark =>
      setup(spark)
      val naive = spark.sql(sql).collect().map(_.toSeq).toSet
      spark.conf.set("spark.graft.rangeJoin.binSize", "64")
      val rewritten = spark.sql(sql)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin")
          && !plan.contains("CartesianProduct"),
        s"range join still plans a nested loop:\n$plan")
      assert(plan.contains("__graft_range_lb"),
        "bucketed rewrite missing from the plan")
      assert(rewritten.collect().map(_.toSeq).toSet == naive)
      assert(naive.nonEmpty)
    }
  }

  test("inverted intervals (hi < lo) match nothing instead of throwing") {
    withSession { spark =>
      import spark.implicits._
      Seq(5L, 50L).toDF("x").createOrReplaceTempView("pts2")
      // one clean interval + one dirty inverted row (lo=100 > hi=5):
      // step=+1 Sequence would throw on the inverted bucket range
      Seq((0L, 30L, "ok"), (100L, 5L, "inverted"))
        .toDF("lo", "hi", "name").createOrReplaceTempView("iv2")
      val q = "SELECT x, name FROM pts2 JOIN iv2 ON x >= lo AND x <= hi"
      val naive = spark.sql(q).collect().map(_.toSeq).toSet
      spark.conf.set("spark.graft.rangeJoin.binSize", "8")
      val rewritten = spark.sql(q).collect().map(_.toSeq).toSet
      assert(rewritten == naive)
      assert(naive == Set(Seq(5L, "ok")))
    }
  }

  test("BETWEEN syntax and flipped comparisons rewrite too") {
    withSession { spark =>
      setup(spark)
      spark.conf.set("spark.graft.rangeJoin.binSize", "50")
      for (q <- Seq(
        "SELECT x, name FROM pts JOIN iv ON x BETWEEN lo AND hi",
        "SELECT x, name FROM pts JOIN iv ON lo <= x AND hi >= x")) {
        val df = spark.sql(q)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"), q)
        assert(df.count() > 0)
      }
    }
  }

  test("joins with a cross-side equality key are left alone") {
    withSession { spark =>
      setup(spark)
      spark.conf.set("spark.graft.rangeJoin.binSize", "64")
      import spark.implicits._
      Seq((0L, 0L, 100L), (1L, 50L, 200L)).toDF("tag2", "lo2", "hi2")
        .createOrReplaceTempView("iv2")
      val df = spark.sql(
        """SELECT x FROM pts JOIN iv2
          |ON tag = tag2 AND x >= lo2 AND x <= hi2""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_range_lb"),
        "equi-keyed join should not be rewritten")
      assert(df.count() > 0)
    }
  }

  test("rule is off by default (binSize unset)") {
    withSession { spark =>
      setup(spark)
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_range_lb"))
    }
  }
}
