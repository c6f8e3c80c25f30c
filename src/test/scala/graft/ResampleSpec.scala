package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Resample

/** Regular-grid resampling (q188/q189): hand-computed fixtures for grid
  * alignment and both gap semantics, plus a brute-force property law
  * (grid point by grid point per-key scan) over a pseudo-random series. */
class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private val Step = 1000000L // 1-second grid, micro timestamps

  private def ts(us: Long) = new Timestamp(us / 1000L) // ms precision in fixture

  // key "a": observations at 0.4s (10.0), 2.0s (30.0), 3.6s (50.0)
  //   aligned grid: 1s, 2s, 3s
  // key "b": single observation → no grid point unless it aligns
  private val series = Seq(
    ("a", ts(400000L), 10.0),
    ("a", ts(2000000L), 30.0),
    ("a", ts(3600000L), 50.0),
    ("b", ts(1500000L), 7.0))
    .toDF("k", "t", "v")

  test("grid aligns to step multiples inside each key's span") {
    val g = Resample.grid(
        series.select(col("k"), unix_micros(col("t")).as("t_us")),
        Seq("k"), "t_us", Step)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(identity).toSeq
    // "b"'s span [1.5s, 1.5s] contains no aligned point → absent
    assert(g == Seq(("a", 1000000L), ("a", 2000000L), ("a", 3000000L)))
  }

  test("grid alignment is floor/ceil on the whole timeline, " +
      "including pre-1970 negative epochs") {
    // DIV truncates toward zero, which would flip ceil/floor below 0:
    // span [-2.5s, -0.5s] must yield {-2s, -1s}, not {-2s, -1s, 0s}
    val g = Resample.grid(
        Seq(("n", -2500000L), ("n", -500000L)).toDF("k", "t_us"),
        Seq("k"), "t_us", Step)
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(g == Seq(-2000000L, -1000000L))
    // and a sub-step negative span contains no aligned point at all
    // (the truncating formula would emit t=0, OUTSIDE the span)
    val none = Resample.grid(
        Seq(("m", -900000L), ("m", -100000L)).toDF("k", "t_us"),
        Seq("k"), "t_us", Step)
      .count()
    assert(none == 0L)
  }

  test("locf carries the latest at-or-before observation") {
    val out = Resample.locf(series, Seq("k"), "t", "v", Step)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(out == Seq(
      ("a", 1000000L, 10.0), // carried from 0.4s
      ("a", 2000000L, 30.0), // exact hit is inclusive
      ("a", 3000000L, 30.0)))
  }

  test("linear interpolates between neighbours, exact at hits") {
    val out = Resample.linear(series, Seq("k"), "t", "v", Step)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    // 1s sits 0.6/1.6 of the way from (0.4s,10) to (2s,30)
    val at1s = 10.0 + (30.0 - 10.0) * (600000.0 / 1600000.0)
    // 3s sits 1.0/1.6 of the way from (2s,30) to (3.6s,50)
    val at3s = 30.0 + (50.0 - 30.0) * (1000000.0 / 1600000.0)
    assert(out == Seq(
      ("a", 1000000L, at1s), ("a", 2000000L, 30.0), ("a", 3000000L, at3s)))
  }

  test("final grid point at the last observation falls back to it") {
    val edge = Seq(("e", ts(0L), 1.0), ("e", ts(2000000L), 9.0))
      .toDF("k", "t", "v")
    val lin = Resample.linear(edge, Seq("k"), "t", "v", Step)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    // at 2s the next-neighbour is strictly-after → none → LOCF fallback
    assert(lin == Seq((0L, 1.0), (1000000L, 5.0), (2000000L, 9.0)))
  }

  test("duplicate timestamps collapse deterministically to max") {
    val dup = Seq(("d", ts(0L), 1.0), ("d", ts(0L), 4.0),
        ("d", ts(2000000L), 4.0))
      .toDF("k", "t", "v")
    val out = Resample.locf(dup, Seq("k"), "t", "v", Step)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(out == Seq((0L, 4.0), (1000000L, 4.0), (2000000L, 4.0)))
  }

  test("property: both semantics match a brute-force per-key replay") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      val k = s"k${rnd.nextInt(5)}"
      (k, ts(rnd.nextInt(50000) * 1000L), rnd.nextInt(1000) / 10.0)
    }
    val df = rows.toDF("k", "t", "v")
    val step = 7000000L // 7s — deliberately coprime-ish with the data grain

    // brute force: per key, dedup-by-max, walk every aligned grid point
    val byKey = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.groupBy(_._2.getTime * 1000L).map { case (t, g) =>
        t -> g.map(_._3).max
      }.toSeq.sortBy(_._1)
    }
    val expected = byKey.flatMap { case (k, obs) =>
      val lo = (obs.head._1 + step - 1) / step * step
      val hi = obs.last._1 / step * step
      (lo to hi by step).map { g =>
        val prev = obs.filter(_._1 <= g).last
        val nextO = obs.find(_._1 > g)
        val lerp = nextO match {
          case None => prev._2
          case Some(nx) => prev._2 + (nx._2 - prev._2) *
            ((g - prev._1).toDouble / (nx._1 - prev._1).toDouble)
        }
        (k, g, prev._2, lerp)
      }
    }.toSeq.sortBy(x => (x._1, x._2))

    val locf = Resample.locf(df, Seq("k"), "t", "v", step)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val lin = Resample.linear(df, Seq("k"), "t", "v", step)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq

    assert(locf == expected.map(e => (e._1, e._2, e._3)))
    assert(lin == expected.map(e => (e._1, e._2, e._4)))
  }

  test("exact grid-on-observation hits survive any input partitioning") {
    // Pins linear()'s tie-order invariant (obs sorts before grid at an
    // equal timestamp): observations placed EXACTLY on aligned grid
    // points — including each key's FIRST observation, the row a
    // flipped tie order would silently null — must come back as the
    // observation value, never null/NaN, under permuted partitioning.
    val step = 2000000L // 2 s
    val rows = for (k <- 0 until 4; i <- 0 until 12) yield {
      // every third observation lands exactly on a grid multiple; the
      // first observation of every key is an exact hit by construction
      val t = if (i % 3 == 0) (i / 3) * 3 * step
              else (i / 3) * 3 * step + i % 3 * 700000L
      (s"k$k", ts(t), (k * 100 + i).toDouble)
    }
    val exactHits = rows.collect {
      case (k, t, v) if (t.getTime * 1000L) % step == 0 =>
        (k, t.getTime * 1000L) -> v
    }.toMap
    assert(exactHits.nonEmpty)
    for (parts <- Seq(1, 3, 7)) {
      val out = Resample.linear(
          rows.toDF("k", "t", "v").repartition(parts),
          Seq("k"), "t", "v", step)
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          Option(r.get(2)).map(_.asInstanceOf[Double])))
      out.foreach { case (key, v) =>
        assert(v.isDefined && !v.get.isNaN, s"null/NaN at $key ($parts)")
        exactHits.get(key).foreach(exp =>
          assert(v.get == exp, s"exact hit $key: ${v.get} != $exp"))
      }
      // every exact hit is an emitted grid row
      assert(exactHits.keySet.subsetOf(out.map(_._1).toSet))
    }
  }
}
