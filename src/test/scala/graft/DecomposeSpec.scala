package graft

import org.apache.spark.sql.functions._

import graft.ops.Decompose

/** Classical additive seasonal decomposition (q199): bit-exact replay
  * of the integer-quantized arithmetic, semantic laws on constructed
  * signals, partitioning independence, duplicate/null handling. */
class DecomposeSpec extends SparkTestBase {
  import spark.implicits._

  private def runOp(rows: Seq[(String, Long, java.lang.Double)], m: Int,
      parts: Int = 4) =
    Decompose.additive(
        rows.toDF("k", "ts", "v").repartition(parts),
        Seq("k"), "ts", "v", m)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDouble(2), r.getInt(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))))
      .toMap

  private def e4(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** The operator's exact arithmetic, replayed sequentially (even m). */
  private def ref(rows: Seq[(String, Long, Double)], m: Int) = {
    val h = m / 2
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val s = rs.sortBy(_._2)
      val ve = s.map(r => e4(r._3 * 10000))
      val n = s.length
      val trend = s.indices.map { i =>
        if (i >= h && i + h < n) {
          val num = 2 * ve.slice(i - h, i + h + 1).sum - ve(i - h) - ve(i + h)
          Some(num.toDouble / (m * 20000.0))
        } else None
      }
      val de = s.indices.map(i => trend(i).map(t => e4((s(i)._3 - t) * 10000)))
      val bySlot = s.indices.flatMap(i => de(i).map(d => (i % m, d)))
        .groupBy(_._1)
      val sme = bySlot.map { case (sl, ds) =>
        sl -> e4(ds.map(_._2).sum.toDouble / ds.length)
      }
      val gsum = sme.values.sum
      val seas = sme.map { case (sl, v) =>
        sl -> ((v.toDouble - gsum.toDouble / sme.size) / 10000.0)
      }
      s.indices.map { i =>
        val sl = i % m
        val se = seas.get(sl)
        ((k, s(i)._2), (s(i)._3, sl, trend(i), se,
          for (t <- trend(i); ss <- se) yield s(i)._3 - t - ss))
      }
    }.toMap
  }

  test("operator matches the sequential integer-exact replay") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(String, Long, java.lang.Double)] =
      for (k <- 0 until 3; i <- 0 until 30)
        yield (s"k$k", i.toLong, Double.box(rnd.nextInt(5000) / 100.0))
    val out = runOp(rows, m = 6)
    val exp = ref(rows.map(r => (r._1, r._2, r._3.doubleValue)), m = 6)
    assert(out.keySet == exp.keySet)
    exp.foreach { case (key, v) => assert(out(key) == v, key.toString) }
  }

  test("a pure periodic signal decomposes into flat trend + the " +
      "pattern + zero residual") {
    // v_t = 100 + pattern(t mod 4): the 2×4 MA over an exact cycle is
    // the cycle mean, seasonal recovers the centered pattern, residual
    // vanishes (up to the 1e-4 quantization the contract documents)
    val pattern = Seq(3.0, -1.0, 5.0, -7.0)
    val rows: Seq[(String, Long, java.lang.Double)] =
      (0 until 24).map(i => ("p", i.toLong, Double.box(100.0 + pattern(i % 4))))
    val out = runOp(rows, m = 4)
    val mean = pattern.sum / 4
    (2 until 22).foreach { i =>
      val (_, slot, trend, seasonal, resid) = out(("p", i.toLong))
      assert(math.abs(trend.get - (100.0 + mean)) < 1e-9, s"trend@$i")
      assert(math.abs(seasonal.get - (pattern(slot) - mean)) < 1e-4,
        s"seasonal@$i")
      assert(math.abs(resid.get) < 1e-4, s"resid@$i")
    }
    // edges: no full centered window -> trend and residual are null
    assert(out(("p", 0L))._3.isEmpty && out(("p", 23L))._3.isEmpty)
  }

  test("odd periods use the plain centered MA") {
    // linear ramp, m=3: centered mean of {v-1, v, v+1} = v exactly
    val rows: Seq[(String, Long, java.lang.Double)] =
      (0 until 12).map(i => ("l", i.toLong, Double.box(10.0 + 2.0 * i)))
    val out = runOp(rows, m = 3)
    (1 until 11).foreach { i =>
      assert(out(("l", i.toLong))._3.contains(10.0 + 2.0 * i), s"@$i")
    }
    assert(out(("l", 0L))._3.isEmpty && out(("l", 11L))._3.isEmpty)
  }

  test("seasonal components of the slots present sum to zero") {
    val rnd = new scala.util.Random(13)
    val rows: Seq[(String, Long, java.lang.Double)] =
      (0 until 40).map(i => ("z", i.toLong, Double.box(rnd.nextInt(1000) / 10.0)))
    val bySlot = runOp(rows, m = 6).values
      .flatMap { case (_, slot, _, se, _) => se.map(slot -> _) }
      .toMap
    assert(bySlot.size == 6)
    assert(math.abs(bySlot.values.sum) < 1e-9)
  }

  test("output is independent of input partitioning") {
    val rnd = new scala.util.Random(29)
    val rows: Seq[(String, Long, java.lang.Double)] =
      for (k <- 0 until 4; i <- 0 until 25)
        yield (s"k$k", i.toLong, Double.box(rnd.nextInt(90000) / 100.0))
    assert(runOp(rows, 6, parts = 1) == runOp(rows, 6, parts = 7))
  }

  test("duplicate timestamps collapse by max and nulls drop") {
    val rows: Seq[(String, Long, java.lang.Double)] = Seq(
      ("d", 1L, Double.box(5.0)), ("d", 1L, Double.box(9.0)),
      ("d", 2L, null), ("d", 3L, Double.box(7.0)))
    val out = runOp(rows, m = 2)
    assert(out.keySet == Set(("d", 1L), ("d", 3L)))
    assert(out(("d", 1L))._1 == 9.0)
  }

  test("a NULL-keyed series is a real group (null-safe join-back)") {
    val rows: Seq[(String, Long, java.lang.Double)] =
      (0 until 10).map(i =>
        (null.asInstanceOf[String], i.toLong,
          Double.box(10.0 + (i % 2))))
    val out = Decompose.additive(
        rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v", 2)
      .collect()
    assert(out.length == 10)
    // interior rows must carry a seasonal — a plain-equality join
    // would have dropped the NULL key's slot rows and nulled them all
    val withSeasonal = out.count(!_.isNullAt(5))
    assert(withSeasonal == 10, s"seasonal survived on $withSeasonal")
    assert(out.count(!_.isNullAt(4)) == 8, "trend on interior rows")
  }

  test("period bound is validated") {
    intercept[IllegalArgumentException] {
      Decompose.additive(Seq(("a", 1L, 1.0)).toDF("k", "ts", "v"),
        Seq("k"), "ts", "v", 1)
    }
  }
}
