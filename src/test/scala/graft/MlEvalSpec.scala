package graft

import org.apache.spark.sql.functions._

import graft.ops.MlEval

/** Bucketed Mann-Whitney AUC vs the pairwise definition, and the
  * out-of-fold target encoder's leakage law. */
class MlEvalSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference AUC by the definition: P(score_pos > score_neg) +
    * 0.5 * P(tie) over all pos x neg pairs. */
  private def pairwiseAuc(rows: Seq[(Long, Int)]): Option[Double] = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      Some(wins / (pos.size.toDouble * neg.size))
    }
  }

  test("rocAuc equals the pairwise definition, ties included") {
    val rows = Seq(
      (10L, 1), (10L, 0), (8L, 1), (8L, 1), (8L, 0), (5L, 0),
      (5L, 1), (3L, 0), (3L, 0), (1L, 1), (1L, 0), (12L, 1))
    val got = MlEval.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().head
    val want = pairwiseAuc(rows).get
    assert(math.abs(got.getAs[Double]("auc") - want) < 1e-12)
    assert(got.getAs[Long]("n_pos") == rows.count(_._2 == 1))
    assert(got.getAs[Long]("n_neg") == rows.count(_._2 == 0))
  }

  test("rocAuc is null when a class is absent, per group") {
    val rows = Seq(("a", 5L, 1), ("a", 3L, 1), ("b", 5L, 1), ("b", 3L, 0))
    val got = MlEval.rocAuc(rows.toDF("g", "s", "y"),
        col("s"), col("y"), Seq("g"))
      .collect().map(r => r.getString(0) -> Option(r.getAs[Any]("auc")))
      .toMap
    assert(got("a").isEmpty)
    assert(got("b").contains(1.0))
  }

  test("rocAuc: perfect, inverted, and random separators") {
    def auc(rows: Seq[(Long, Int)]): Double =
      MlEval.rocAuc(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head.getAs[Double]("auc")
    assert(auc(Seq((9L, 1), (8L, 1), (2L, 0), (1L, 0))) == 1.0)
    assert(auc(Seq((1L, 1), (2L, 1), (8L, 0), (9L, 0))) == 0.0)
    assert(auc(Seq((5L, 1), (5L, 0))) == 0.5) // all-tied = coin flip
  }

  test("rocAuc matches pairwise on a randomized series (partitioning-proof)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(2)))
    val got = MlEval.rocAuc(rows.toDF("s", "y").repartition(7),
        col("s"), col("y"))
      .collect().head.getAs[Double]("auc")
    assert(math.abs(got - pairwiseAuc(rows).get) < 1e-12)
  }

  test("targetEncode never uses a row's own fold (leakage law)") {
    // cat A: fold 0 all-positive, fold 1 all-negative. With m=0, the
    // encoding for (A, 0) must come ONLY from fold 1 (= 0.0) and vice
    // versa — any leak of the own fold would pull it toward 0.5.
    val df = Seq(
      ("A", 0, 1L), ("A", 0, 1L), ("A", 1, 0L), ("A", 1, 0L),
      ("B", 0, 1L), ("B", 1, 0L)).toDF("cat", "fold", "t")
    val enc = MlEval.targetEncode(df, col("cat"), col("fold"), col("t"),
        smoothing = 0.0)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Double]("enc"))
      .toMap
    assert(enc(("A", 0)) == 0.0)
    assert(enc(("A", 1)) == 1.0)
  }

  test("targetEncode smoothing pulls toward the out-of-fold prior") {
    val df = Seq(
      ("A", 0, 1L), ("A", 1, 0L), ("A", 1, 0L),
      ("B", 0, 0L), ("B", 1, 1L)).toDF("cat", "fold", "t")
    // for (A, 0): oof evidence = fold-1 rows of A (sum 0, cnt 2);
    // prior excluding fold 0 = (0 + 0 + 1) / 3
    val m = 6.0
    val want = (0.0 + m * (1.0 / 3.0)) / (2.0 + m)
    val got = MlEval.targetEncode(df, col("cat"), col("fold"), col("t"), m)
      .filter(col("cat") === "A" && col("fold") === 0)
      .collect().head.getAs[Double]("enc")
    assert(math.abs(got - want) < 1e-12)
  }

  test("targetEncode with m=0 and no out-of-fold evidence is null") {
    val df = Seq(("A", 0, 1L), ("B", 1, 0L)).toDF("cat", "fold", "t")
    val got = MlEval.targetEncode(df, col("cat"), col("fold"), col("t"), 0.0)
      .filter(col("cat") === "A" && col("fold") === 0)
      .collect().head
    assert(got.isNullAt(got.fieldIndex("enc")))
    assert(got.getAs[Long]("n_oof") == 0L)
  }

  /** Reference step-wise AP with tie blocks (sklearn definition). */
  private def stepwiseAp(rows: Seq[(Long, Int)]): Option[Double] = {
    val p = rows.count(_._2 == 1)
    if (p == 0) None
    else {
      var cp = 0L; var cn = 0L; var ap = 0.0
      for ((_, block) <- rows.groupBy(_._1).toSeq.sortBy(-_._1)) {
        val bp = block.count(_._2 == 1); val bn = block.size - bp
        cp += bp; cn += bn
        if (bp > 0)
          ap += math.round(bp.toDouble * (cp.toDouble / (cp + cn)) * 1e9)
      }
      Some(ap / 1e9 / p)
    }
  }

  test("prAuc matches the step-wise definition, ties in blocks") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(300)((rnd.nextInt(15).toLong,
      if (rnd.nextInt(10) == 0) 1 else 0)) // 1:9 imbalance
    val got = MlEval.prAuc(rows.toDF("s", "y").repartition(5),
        col("s"), col("y"))
      .collect().head
    assert(math.abs(got.getAs[Double]("pr_auc")
      - stepwiseAp(rows).get) < 1e-12)
  }

  test("prAuc: perfect separator is 1.0, no positives is null") {
    val perfect = MlEval.prAuc(
      Seq((9L, 1), (8L, 1), (2L, 0), (1L, 0)).toDF("s", "y"),
      col("s"), col("y")).collect().head
    assert(perfect.getAs[Double]("pr_auc") == 1.0)
    val none = MlEval.prAuc(
      Seq((9L, 0), (1L, 0)).toDF("s", "y"),
      col("s"), col("y")).collect().head
    assert(none.isNullAt(none.fieldIndex("pr_auc")))
  }

  test("gini: even shares zero, full concentration (n-1)/n, hand case") {
    import graft.ops.RobustStats
    def g(xs: Seq[Long]): Double =
      RobustStats.gini(xs.map(Tuple1(_)).toDF("x"), "x")
        .collect().head.getAs[Double]("gini")
    assert(g(Seq(5L, 5L, 5L, 5L)) == 0.0)
    assert(g(Seq(0L, 0L, 0L, 10L)) == 0.75) // (n-1)/n for n=4
    // masses 1,2,3,4: sum(i*x) = 1+4+9+16 = 30; 60/40 - 5/4 = 0.25
    assert(g(Seq(1L, 2L, 3L, 4L)) == 0.25)
    intercept[IllegalArgumentException] {
      RobustStats.gini(Seq(Tuple1(1.5)).toDF("x"), "x")
    }
  }

  test("gini: per-group, tie-order-proof under repartitioning") {
    import graft.ops.RobustStats
    val rows = Seq(("a", 7L), ("a", 7L), ("a", 7L),
      ("b", 1L), ("b", 1L), ("b", 8L))
    val run1 = RobustStats.gini(rows.toDF("g", "x"), "x", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    val run2 = RobustStats.gini(rows.toDF("g", "x").repartition(5),
        "x", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(run1 == run2)
    assert(run1("a") == 0.0)
    // b: ranks over (1,1,8): sum(i*x) = 1 + 2 + 24 = 27;
    // 54/30 - 4/3 = 0.466667
    assert(run1("b") == 0.466667)
  }

  test("conformalSplit: exact order-statistic qhat and coverage") {
    // cal errors 1..10, alpha=0.2: k = ceil(0.8*11) = 9 -> qhat = 9;
    // test errors {5, 9, 10}: 5 and 9 covered, 10 not
    val rows = (1L to 10L).map(e => ("k", e, true)) ++
      Seq(("k", 5L, false), ("k", 9L, false), ("k", 10L, false))
    val got = MlEval.conformalSplit(rows.toDF("g", "err", "cal"),
      Seq("g"), "err", "cal", alpha = 0.2).collect().head
    assert(got.getAs[Long]("n_cal") == 10L)
    assert(got.getAs[Long]("qhat") == 9L)
    assert(got.getAs[Long]("n_test") == 3L)
    assert(got.getAs[Long]("n_covered") == 2L)
    assert(got.getAs[Double]("coverage") == 0.6667)
  }

  test("conformalSplit: k beyond n_cal has no finite qhat (honest null)") {
    // n_cal = 3, alpha = 0.1: k = ceil(0.9*4) = 4 > 3
    val rows = Seq(("k", 1L, true), ("k", 2L, true), ("k", 3L, true),
      ("k", 2L, false), ("k", 9L, false))
    val got = MlEval.conformalSplit(rows.toDF("g", "err", "cal"),
      Seq("g"), "err", "cal", alpha = 0.1).collect().head
    assert(got.isNullAt(got.fieldIndex("qhat")))
    assert(got.isNullAt(got.fieldIndex("coverage")))
    assert(got.getAs[Long]("n_cal") == 3L) // recovered, not zeroed
    assert(got.getAs[Long]("n_test") == 2L)
  }

  test("conformalSplit: mean coverage tracks 1 - alpha on exchangeable data") {
    val rnd = new scala.util.Random(3)
    val rows = for (k <- 0 until 50; i <- 0 until 40)
      yield (s"k$k", rnd.nextInt(1000).toLong, i < 20)
    val cov = MlEval.conformalSplit(rows.toDF("g", "err", "cal"),
        Seq("g"), "err", "cal", alpha = 0.2)
      .agg(avg(col("coverage"))).collect().head.getDouble(0)
    // per-key guaranteed >= 0.8 in expectation; a 50-key mean with
    // 20 test points each sits well inside this band
    assert(cov > 0.72 && cov <= 1.0, s"mean coverage $cov")
  }

  test("conformalSplit: NULL scores and NULL split flags are dropped, " +
    "never ranked") {
    // without the guard a NULL err would sort FIRST (Spark ascending)
    // and shift the order statistic from 9 to 8
    val rows: Seq[(String, Option[Long], Option[Boolean])] =
      (1L to 10L).map(e => ("k", Some(e), Some(true))) ++
        Seq(("k", None, Some(true)), ("k", Some(4L), None),
          ("k", Some(9L), Some(false)), ("k", Some(10L), Some(false)))
    val got = MlEval.conformalSplit(rows.toDF("g", "err", "cal"),
      Seq("g"), "err", "cal", alpha = 0.2).collect().head
    assert(got.getAs[Long]("n_cal") == 10L)
    assert(got.getAs[Long]("qhat") == 9L)
    assert(got.getAs[Long]("n_test") == 2L)
    assert(got.getAs[Long]("n_covered") == 1L)
  }

  test("conformalSplit validates alpha and integral errors") {
    val df = Seq(("k", 1.5, true)).toDF("g", "err", "cal")
    intercept[IllegalArgumentException] {
      MlEval.conformalSplit(df, Seq("g"), "err", "cal", 0.2)
    }
    intercept[IllegalArgumentException] {
      MlEval.conformalSplit(
        Seq(("k", 1L, true)).toDF("g", "err", "cal"),
        Seq("g"), "err", "cal", 0.0)
    }
  }

  test("maintained AUC view is bit-identical to the one-shot rocAuc") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(2)))
    val df = rows.toDF("id", "s", "y")
    val root = s"${graft.core.Scratch.root(df)}/aucview_" +
      java.util.UUID.randomUUID()
    graft.core.Scratch.registerForCleanup(root)
    for (i <- 0 to 2) {
      graft.core.VersionedTable.commitAppend(
        df.filter(pmod(col("id"), lit(3)) === i), s"$root/base")
      val r = graft.ops.IncrementalAgg.maintain(
        spark, s"$root/base", s"$root/agg", Seq("s"), "y")
      assert(i == 0 || r.mode == "incremental",
        s"refresh $i took ${r.mode}")
    }
    val fromView = MlEval.aucFromCounts(
        graft.ops.IncrementalAgg.read(spark, s"$root/agg"),
        "s", "sum_val", "n_rows")
      .collect().head
    val oneShot = MlEval.rocAuc(df, col("s"), col("y")).collect().head
    assert(fromView.getAs[Double]("auc") == oneShot.getAs[Double]("auc"))
    assert(fromView.getAs[Long]("n_pos") == oneShot.getAs[Long]("n_pos"))
    assert(fromView.getAs[Long]("n_neg") == oneShot.getAs[Long]("n_neg"))
  }
}
