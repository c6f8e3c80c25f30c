package graft

import org.apache.spark.sql.functions._

import graft.ops._

/** Specs for the round-2 operator extensions: as-of join, range join,
  * deterministic sampling, TF-IDF, bucketed co-located join. */
class ExtendedOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- AsofJoin ------------------------------------------------------

  private def clicks = Seq(
    (101L, 1L, ts("2026-01-01 10:00:00")),
    (102L, 1L, ts("2026-01-01 12:00:00")),
    (103L, 2L, ts("2026-01-01 09:00:00")), // before any purchase
    (104L, 2L, ts("2026-01-01 11:00:00"))
  ).toDF("event_id", "user_id", "ts")

  private def purchases = Seq(
    (201L, 1L, ts("2026-01-01 09:30:00"), 5.0),
    (202L, 1L, ts("2026-01-01 12:00:00"), 7.0), // equal-ts: inclusive
    (203L, 2L, ts("2026-01-01 10:30:00"), 9.0)
  ).toDF("purchase_id", "user_id", "ts", "purchase_value")

  test("AsofJoin.backward picks the latest preceding right row, inclusive") {
    val out = AsofJoin.backward(clicks, purchases,
      Seq("user_id"), Seq("user_id"), "ts", "ts",
      payload = Seq("purchase_id", "purchase_value"))
      .orderBy("event_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(byId(101L) == Some(201L)) // 09:30 precedes 10:00
    assert(byId(102L) == Some(202L)) // equal timestamp matches (inclusive)
    assert(byId(103L) == None)       // nothing precedes 09:00
    assert(byId(104L) == Some(203L))
  }

  test("AsofJoin.forward picks the earliest following right row, " +
      "inclusive") {
    val out = AsofJoin.forward(clicks, purchases,
      Seq("user_id"), Seq("user_id"), "ts", "ts",
      payload = Seq("purchase_id", "purchase_value"))
      .orderBy("event_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(byId(101L) == Some(202L)) // next after 10:00 is 12:00
    assert(byId(102L) == Some(202L)) // equal timestamp matches (inclusive)
    assert(byId(103L) == Some(203L)) // 10:30 follows 09:00
    assert(byId(104L) == None)       // nothing after 11:00 for user 2
  }

  test("AsofJoin.forward tolerance discards too-far matches") {
    val out = AsofJoin.forward(clicks, purchases,
      Seq("user_id"), Seq("user_id"), "ts", "ts",
      payload = Seq("purchase_id"), tolerance = Some("90 minutes"))
      .orderBy("event_id").collect()
    val byId = out.map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(byId(101L) == None)        // 12:00 is 2h after 10:00
    assert(byId(103L).contains(203L)) // 90min gap, at tolerance edge
  }

  test("AsofJoin.backward tolerance discards too-old matches") {
    val out = AsofJoin.backward(clicks, purchases,
      Seq("user_id"), Seq("user_id"), "ts", "ts",
      payload = Seq("purchase_id"), tolerance = Some("10 minutes"))
      .orderBy("event_id").collect()
    val byId = out.map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(byId(101L) == None)        // 09:30 is 30min before 10:00
    assert(byId(102L).contains(202L)) // 0min gap, within tolerance
  }

  test("AsofJoin.backward matches a naive per-row computation") {
    val naive = clicks.as[(Long, Long, java.sql.Timestamp)].collect().map {
      case (eid, uid, t) =>
        val best = purchases.as[(Long, Long, java.sql.Timestamp, Double)]
          .collect()
          .filter(p => p._2 == uid && !p._3.after(t))
          .sortBy(_._3.getTime).lastOption.map(_._1)
        eid -> best
    }.toMap
    val got = AsofJoin.backward(clicks, purchases,
      Seq("user_id"), Seq("user_id"), "ts", "ts",
      payload = Seq("purchase_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got == naive)
  }

  // ---- RangeJoin -----------------------------------------------------

  test("RangeJoin matches naive BETWEEN semantics incl. boundaries") {
    val intervals = Seq(
      (1L, ts("2026-01-01 00:00:00"), ts("2026-01-03 00:00:00")),
      (2L, ts("2026-01-02 12:00:00"), ts("2026-01-02 13:00:00")),
      (3L, ts("2026-02-01 00:00:00"), ts("2026-02-10 00:00:00"))
    ).toDF("iv_id", "lo", "hi")
    val points = Seq(
      (10L, ts("2026-01-01 00:00:00")), // lo boundary of iv1
      (11L, ts("2026-01-03 00:00:00")), // hi boundary of iv1
      (12L, ts("2026-01-02 12:30:00")), // inside iv1 AND iv2
      (13L, ts("2026-03-01 00:00:00"))  // no interval
    ).toDF("pt_id", "pt")

    val got = RangeJoin.pointInInterval(points, "pt", intervals,
      "lo", "hi", bucketWidthSeconds = 86400)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = points.crossJoin(intervals)
      .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((10L, 1L), (11L, 1L), (12L, 1L), (12L, 2L)))
  }

  test("RangeJoin plans an equi-join, not a nested loop") {
    val intervals = Seq((1L, ts("2026-01-01 00:00:00"),
      ts("2026-01-02 00:00:00"))).toDF("iv_id", "lo", "hi")
    val points = Seq((10L, ts("2026-01-01 12:00:00"))).toDF("pt_id", "pt")
    val plan = RangeJoin.pointInInterval(points, "pt", intervals,
      "lo", "hi", 86400).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  // ---- DeterministicSample -------------------------------------------

  private def ids = spark.range(0, 2000).toDF("id")

  test("byHash is deterministic and partitioning-invariant") {
    val a = DeterministicSample.byHash(ids, col("id"), 64)
      .as[Long].collect().sorted.toSeq
    val b = DeterministicSample.byHash(ids.repartition(13), col("id"), 64)
      .as[Long].collect().sorted.toSeq
    assert(a == b)
    // 64/256 = 25% nominal; md5 is uniform, so 2000 draws land near 500
    assert(a.size > 350 && a.size < 650)
  }

  test("byHash edge rates: 0 keeps nothing, 256 keeps everything") {
    assert(DeterministicSample.byHash(ids, col("id"), 0).count() == 0)
    assert(DeterministicSample.byHash(ids, col("id"), 256).count() == 2000)
  }

  test("stratifiedByHash rejects out-of-range rates") {
    intercept[IllegalArgumentException] {
      DeterministicSample.stratifiedByHash(ids, col("id"),
        col("id").cast("string"), Map("1" -> -1))
    }
  }

  test("stratifiedByHash applies per-stratum rates, drops unlisted") {
    val df = ids.withColumn("s",
      when(col("id") % 3 === 0, "keep_all")
        .when(col("id") % 3 === 1, "half").otherwise("unlisted"))
    val out = DeterministicSample.stratifiedByHash(df, col("id"), col("s"),
      Map("keep_all" -> 256, "half" -> 128))
    val counts = out.groupBy("s").count().as[(String, Long)]
      .collect().toMap
    assert(counts("keep_all") == df.filter(col("s") === "keep_all").count())
    assert(!counts.contains("unlisted"))
    val halfTotal = df.filter(col("s") === "half").count()
    assert(counts("half") > halfTotal * 0.35 && counts("half") < halfTotal * 0.65)
  }

  test("perGroupTopK returns at most k rows per group, deterministically") {
    val df = ids.withColumn("g", col("id") % 7)
    val out = DeterministicSample.perGroupTopK(df, Seq("g"), col("id"), 5)
    val sizes = out.groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(sizes.values.forall(_ == 5))
    val again = DeterministicSample.perGroupTopK(
      df.repartition(11), Seq("g"), col("id"), 5)
      .select("g", "id").as[(Long, Long)].collect().toSet
    assert(again == out.select("g", "id").as[(Long, Long)].collect().toSet)
  }

  // ---- TfIdf ---------------------------------------------------------

  test("TfIdf.score computes smoothed tf-idf on a hand-checked corpus") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = operators.TfIdf.score(docs, "doc_id", "text")
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // N=2; df(a)=2 -> idf=ln(3/3)+1=1; df(b)=df(c)=1 -> idf=ln(3/2)+1
    assert(out((1L, "a")) == ((2L, 2.0)))
    assert(out((2L, "a")) == ((1L, 1.0)))
    val rare = math.rint((math.log(3.0 / 2.0) + 1.0) * 1e4) / 1e4
    assert(out((1L, "b")) == ((1L, rare)))
    assert(out((2L, "c")) == ((1L, rare)))
  }

  test("TfIdf.topTerms ranks rare terms above ubiquitous ones") {
    val docs = Seq((1L, "common rare1 common"), (2L, "common rare2"),
      (3L, "common rare3")).toDF("doc_id", "text")
    val top1 = operators.TfIdf.topTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    assert(top1 == Map(1L -> "common", 2L -> "rare2", 3L -> "rare3"))
    // doc1: tf(common)=2 beats rare1's idf edge; docs 2-3: rare wins
  }

  // ---- BucketedJoin --------------------------------------------------

  test("bucketed join of co-bucketed tables plans zero shuffles") {
    // force the sort-merge path: a broadcast join would hide whether
    // bucketing actually removed the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark.range(0, 1000).toDF("k")
        .withColumn("lv", col("k") * 2)
      val right = spark.range(0, 1000, 3).toDF("k")
        .withColumn("rv", col("k") + 1)
      val lb = BucketedJoin.writeBucketed(left, "t_ext_left", 4, "k")
      val rb = BucketedJoin.writeBucketed(right, "t_ext_right", 4, "k")
      val joined = lb.join(rb, "k")
      assert(joined.count() == 334)
      // descend through AQE wrappers to the real executed nodes
      def nodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val next = p match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(q.plan)
          case _ => p.children
        }
        p +: next.flatMap(nodes)
      }
      val shuffles = nodes(joined.queryExecution.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty, "co-bucketed join must not shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
