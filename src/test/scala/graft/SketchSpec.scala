package graft

import org.apache.spark.sql.functions._

import graft.functions.{CmsState, CountMin}

/** Count-min sketch laws: never undercounts, exact when collision-free,
  * and merge-of-partials ≡ build-on-union.
  */
class SketchSpec extends SparkTestBase {
  import spark.implicits._

  test("CmsState: estimate is exact without collisions, never under") {
    val st = new CmsState(5, 1024)
    (1L to 50L).foreach(k => (0 until k.toInt).foreach(_ => st.add(k)))
    (1L to 50L).foreach { k =>
      val e = st.estimate(k)
      assert(e >= k, s"undercount for $k: $e")
      // 50 distinct keys in 1024 slots × 5 rows: collisions that
      // survive the min across all 5 rows are effectively impossible
      assert(e == k, s"collision overcount for $k: $e")
    }
    assert(st.total == (1L to 50L).sum)
  }

  test("CmsState: merge equals build-on-union; shape mismatch throws") {
    val a = new CmsState(4, 64); val b = new CmsState(4, 64)
    (1L to 30L).foreach(a.add); (20L to 60L).foreach(b.add)
    val u = new CmsState(4, 64)
    ((1L to 30L) ++ (20L to 60L)).foreach(u.add)
    a.merge(b)
    assert(a.counts.sameElements(u.counts) && a.total == u.total)
    intercept[IllegalArgumentException] {
      a.merge(new CmsState(4, 128))
    }
  }

  test("serialized estimate matches in-memory estimate") {
    val st = new CmsState(5, 256)
    (1L to 100L).foreach(st.add)
    val bytes = st.serialize()
    (1L to 100L).foreach { k =>
      assert(CmsState.estimateSerialized(bytes, k) == st.estimate(k))
    }
    assert(CmsState.totalSerialized(bytes) == 100L)
  }

  test("agg → mergeAgg → estimate round-trips through SQL, skips null") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), Some(2L),
      Some(3L), None)
      .zipWithIndex
      .map { case (k, i) => (i % 2, k) }.toDF("part", "key")
    // two partial sketches (one per part), then rolled up
    val daily = df.groupBy(col("part"))
      .agg(CountMin.agg(col("key"), depth = 5, width = 256).as("sk"))
    val merged = daily.agg(CountMin.mergeAgg(col("sk")).as("sk"))
    val out = Seq(1L, 2L, 3L).toDF("key")
      .crossJoin(broadcast(merged))
      .select(col("key"), CountMin.estimate(col("sk"), col("key"))
        .as("est"), CountMin.total(col("sk")).as("n"))
      .orderBy("key").collect()
    assert(out.map(_.getAs[Long]("est")).toSeq == Seq(3L, 2L, 1L))
    assert(out.head.getAs[Long]("n") == 6L) // null key not counted
  }

  test("quantile sketch: rank guarantee on a known distribution") {
    import graft.functions.QSketchState
    val st = QSketchState.empty(0.01)
    (1 to 10000).foreach(i => st.insert(i.toDouble))
    val p50 = QSketchState.querySerialized(QSketchState.serialize(st), 0.5)
    val p95 = QSketchState.querySerialized(QSketchState.serialize(st), 0.95)
    assert(math.abs(p50 - 5000.0) <= 100.0, s"p50=$p50")
    assert(math.abs(p95 - 9500.0) <= 100.0, s"p95=$p95")
  }

  test("quantile sketch: merge of partials ≈ build-on-union") {
    import graft.functions.QSketchState
    val a = QSketchState.empty(0.01); val b = QSketchState.empty(0.01)
    (1 to 5000).foreach(i => a.insert(i.toDouble))
    (5001 to 10000).foreach(i => b.insert(i.toDouble))
    a.merge(b)
    val bytes = QSketchState.serialize(a)
    assert(QSketchState.deserialize(bytes).qs.count == 10000L)
    val p50 = QSketchState.querySerialized(bytes, 0.5)
    // 2ε slack after one merge level
    assert(math.abs(p50 - 5000.0) <= 200.0, s"merged p50=$p50")
  }

  test("quantile sketch: serialize/deserialize round-trip, empty → NaN") {
    import graft.functions.QSketchState
    val st = QSketchState.empty(0.01)
    Seq(3.0, 1.0, 2.0).foreach(st.insert)
    val rt = QSketchState.deserialize(QSketchState.serialize(st))
    assert(rt.qs.count == 3L)
    assert(QSketchState.querySerialized(QSketchState.serialize(rt), 0.5)
      == 2.0)
    val empty = QSketchState.serialize(QSketchState.empty(0.01))
    assert(QSketchState.querySerialized(empty, 0.5).isNaN)
  }

  test("quantile agg → mergeAgg → query through SQL") {
    import graft.functions.QuantileSketch
    val df = (1 to 1000).map(i => (i % 4, i.toDouble)).toDF("part", "v")
    val daily = df.groupBy(col("part"))
      .agg(QuantileSketch.agg(col("v"), 0.01).as("sk"))
    val merged = daily.agg(QuantileSketch.mergeAgg(col("sk")).as("sk"))
      .select(QuantileSketch.query(col("sk"), lit(0.5)).as("p50"))
      .collect().head.getAs[Double]("p50")
    assert(math.abs(merged - 500.0) <= 30.0, s"p50=$merged")
  }

  test("mergeAgg of a single sketch is the identity") {
    val df = Seq(1L, 1L, 2L).toDF("key")
    val one = df.agg(CountMin.agg(col("key"), 4, 64).as("sk"))
    val rolled = one.agg(CountMin.mergeAgg(col("sk")).as("sk"))
    val est = rolled.select(
      CountMin.estimate(col("sk"), lit(1L)).as("e1"),
      CountMin.estimate(col("sk"), lit(2L)).as("e2")).collect().head
    assert(est.getAs[Long]("e1") == 2L && est.getAs[Long]("e2") == 1L)
  }
}
