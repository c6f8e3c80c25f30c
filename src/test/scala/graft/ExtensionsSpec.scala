package graft

import org.apache.spark.sql.SparkSession

/** The `spark.sql.extensions` registration path: a session configured
  * with GraftExtensions resolves the custom functions in plain SQL with
  * no Scala entry point.
  *
  * Extensions only apply when the session is BUILT, and getOrCreate
  * reuses any live session, so this spec stops the shared one first
  * and stops its own after — suites run sequentially in the forked
  * test JVM, and every other suite's lazy session re-creates on
  * demand. */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def sessionWithExtensions: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("sketch functions compose in plain SQL end-to-end") {
    val spark2 = sessionWithExtensions
    try {
      import spark2.implicits._
      (1 to 100).map(i => (i % 4, i.toLong, i.toDouble))
        .toDF("part", "k", "v").createOrReplaceTempView("t")
      val row = spark2.sql(
        """SELECT cms_estimate(cms_merge(sk), 7L) AS est,
          |  quantile_sketch_query(quantile_sketch_merge(qk), 0.5D) AS p50
          |FROM (
          |  SELECT part, count_min(k) AS sk, quantile_sketch(v) AS qk
          |  FROM t GROUP BY part)""".stripMargin).collect().head
      assert(row.getAs[Long]("est") == 1L)
      assert(math.abs(row.getAs[Double]("p50") - 50.0) <= 5.0)
      assert(spark2.sql(
        "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .collect().head.getAs[Double]("c") == 1.0)
    } finally spark2.stop()
  }

  test("spark.sql.extensions installs graft functions cluster-wide") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-test")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT simhash64(array('a','b')) AS sh,
          |  size(minhash_signature(array('a','b'), 8)) AS k,
          |  size(word_shingles(array('a','b','c'), 2)) AS ns,
          |  hyperplane_lsh(array(CAST(0.5 AS FLOAT)), 4) AS hb
          |""".stripMargin).collect().head
      assert(row.getLong(0) != 0L)
      assert(row.getInt(1) == 8)
      assert(row.getInt(2) == 2)
      assert(row.getLong(3) >= 0L)
      // the bounded-heap aggregate resolves in SQL too
      val topk = spark.sql(
        """SELECT top_k_by_score(s, i, 2) AS t FROM VALUES
          |  (1.0D, 10L), (3.0D, 20L), (2.0D, 30L) AS v(s, i)
          |""".stripMargin).collect().head
      val entries = topk.getSeq[org.apache.spark.sql.Row](0)
      assert(entries.map(_.getLong(1)) == Seq(20L, 30L))
      // ordered statistical folds resolve in SQL over window frames
      val folds = spark.sql(
        """SELECT t,
          |  ewma(v, 0.5) OVER w AS e,
          |  cusum(v, 10.0, 0.0) OVER w AS c
          |FROM VALUES (1, 10.0D), (2, 20.0D), (3, 30.0D) AS x(t, v)
          |WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
          |  AND CURRENT ROW)
          |ORDER BY t""".stripMargin).collect()
      assert(folds.map(_.getDouble(1)).toSeq == Seq(10.0, 15.0, 22.5))
      assert(folds.last.getStruct(2).getDouble(0) == 30.0) // (0+10)+20
      // integral literal spellings resolve too (cusum(v, 100, 10))
      val intSpelled = spark.sql(
        """SELECT cusum(v, 10, 0) OVER (ORDER BY v ROWS BETWEEN
          |  UNBOUNDED PRECEDING AND CURRENT ROW) AS c
          |FROM VALUES (30.0D) AS x(v)""".stripMargin).collect().head
      assert(intSpelled.getStruct(0).getDouble(0) == 20.0)
      // holt resolves from SQL with the documented (x, alpha, beta)
      // order: rows 10, 20 at a=0.5, b=0.5 -> level 15.0, trend 2.5
      val hl = spark.sql(
        """SELECT t, holt(v, 0.5, 0.5) OVER w AS h
          |FROM VALUES (1, 10.0D), (2, 20.0D) AS x(t, v)
          |WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
          |  AND CURRENT ROW)
          |ORDER BY t""".stripMargin).collect()
      val h2 = hl.last.getStruct(1)
      assert(h2.getDouble(0) == 15.0 && h2.getDouble(1) == 2.5,
        h2.toString)
      // ewvar resolves from SQL: rows 10, 20 at a=0.5 -> mean 15.0,
      // var = 0.5*(0 + 10*(0.5*10)) = 25.0
      val ev = spark.sql(
        """SELECT t, ewvar(v, 0.5) OVER w AS e
          |FROM VALUES (1, 10.0D), (2, 20.0D) AS x(t, v)
          |WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
          |  AND CURRENT ROW)
          |ORDER BY t""".stripMargin).collect()
      val e2 = ev.last.getStruct(1)
      assert(e2.getDouble(0) == 15.0 && e2.getDouble(1) == 25.0,
        e2.toString)
      // kalman resolves from SQL: rows 10, 20 at q=0.25, r=4
      val kf = spark.sql(
        """SELECT t, kalman(v, 0.25, 4.0) OVER w AS f
          |FROM VALUES (1, 10.0D), (2, 20.0D) AS x(t, v)
          |WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
          |  AND CURRENT ROW)
          |ORDER BY t""".stripMargin).collect()
      val kk = (4.0 + 0.25) / ((4.0 + 0.25) + 4.0)
      val f2 = kf.last.getStruct(1)
      assert(f2.getDouble(0) == 10.0 + kk * 10.0 &&
        f2.getDouble(1) == (1.0 - kk) * 4.25 &&
        f2.getDouble(2) == kk, f2.toString)
      // a wrong-arity call names the signature, not IndexOutOfBounds
      val arity = intercept[Exception] {
        spark.sql("SELECT holt(v, 0.5) OVER (ORDER BY v) FROM " +
          "VALUES (1.0D) AS x(v)").collect()
      }
      def am(e: Throwable): Seq[String] = Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ am(x.getCause))
      assert(am(arity).exists(_.contains("takes 3 arguments")))
      // and the groupBy path raises rather than folding shuffle order
      val err = intercept[Exception] {
        spark.sql(
          "SELECT ewma(v, 0.5) FROM VALUES (1.0D), (2.0D) AS x(v)"
        ).collect()
      }
      def msgs(e: Throwable): Seq[String] = Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(err).exists(_.contains("ordered window")))
    } finally spark.stop()
  }

  test("ordered folds are rejected at ANALYSIS time in grouping aggs") {
    // defense-in-depth beyond the merge-raise: the check rule fires
    // when the plan is analyzed (no collect), so even a hypothetical
    // Complete-mode physical plan — which never runs merge — cannot
    // fold shuffle order. Window use still analyzes fine.
    val spark2 = sessionWithExtensions
    try {
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        spark2.sql(
          "SELECT ewma(v, 0.5) FROM VALUES (1.0D), (2.0D) AS x(v)")
      }
      assert(err.getMessage.contains("ordered window"))
      intercept[org.apache.spark.sql.AnalysisException] {
        spark2.sql("SELECT holt_winters(v, 0.3, 0.2, 0.4, 4) FROM " +
          "VALUES (1.0D) AS x(v)")
      }
      intercept[org.apache.spark.sql.AnalysisException] {
        spark2.sql(
          "SELECT ewvar(v, 0.5) FROM VALUES (1.0D), (2.0D) AS x(v)")
      }
      intercept[org.apache.spark.sql.AnalysisException] {
        spark2.sql(
          "SELECT kalman(v, 0.25, 4.0) FROM VALUES (1.0D) AS x(v)")
      }
      // nested plans too: an ordered fold inside a scalar subquery's
      // grouping aggregate must not slip past the root-plan traversal
      val sub = intercept[org.apache.spark.sql.AnalysisException] {
        spark2.sql(
          """SELECT k, (SELECT ewma(v, 0.5) FROM VALUES (1.0D), (2.0D)
            |  AS y(v)) AS e
            |FROM VALUES ('a') AS x(k)""".stripMargin)
      }
      assert(sub.getMessage.contains("ordered window"))
      // window use is untouched by the rule
      val hw = spark2.sql(
        """SELECT t, holt_winters(v, 0.5, 0.5, 0.5, 4) OVER w AS h
          |FROM VALUES (1, 10.0D), (2, 20.0D) AS x(t, v)
          |WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
          |  AND CURRENT ROW)
          |ORDER BY t""".stripMargin).collect()
      val h2 = hw.last.getStruct(1)
      // seed l=10, b=0; step: sm=seas[1]=0, l'=0.5*20+0.5*10=15,
      // b'=0.5*5=2.5, s'=0.5*(20-15)=2.5, forecast=15+2.5+seas[2]=17.5
      assert(h2.getDouble(0) == 15.0 && h2.getDouble(1) == 2.5 &&
        h2.getDouble(2) == 2.5 && h2.getDouble(3) == 17.5, h2.toString)
    } finally spark2.stop()
  }

  test("media parse/decode functions resolve in plain SQL") {
    val spark2 = sessionWithExtensions
    try {
      import spark2.implicits._
      val mm = graft.multimodal.MultimodalOps
      Seq(
        (1L, mm.bmpFile(2, 1, (x, _) => (10 * (x + 1), 0, 5))),
        (2L, mm.wavFile(16000, Array[Short](3, -4))))
        .toDF("id", "b").createOrReplaceTempView("media")
      val bmp = spark2.sql(
        """SELECT media_header(b).format AS fmt,
          |  bmp_pixel_stats(b).sum_r AS sr,
          |  bmp_pixel_stats(b).n_pixels AS np
          |FROM media WHERE id = 1""".stripMargin).collect().head
      assert(bmp.getString(0) == "bmp")
      assert(bmp.getLong(1) == 30L && bmp.getLong(2) == 2L)
      // bilinear resize resolves in SQL too: 2x1 -> 1x1 mixes the two
      // pixels equally ((10,0,5) and (20,0,5) -> (15, 0, 5))
      val rs = spark2.sql(
        "SELECT image_resize(b, 1, 1) AS r FROM media WHERE id = 1"
      ).collect().head.getSeq[Float](0)
      assert(rs == Seq(15f, 0f, 5f))
      val wav = spark2.sql(
        """SELECT media_header(b).sample_rate AS rate,
          |  wav_pcm_stats(b).n_samples AS n,
          |  wav_pcm_stats(b).peak_abs AS peak
          |FROM media WHERE id = 2""".stripMargin).collect().head
      assert(wav.getInt(0) == 16000)
      assert(wav.getLong(1) == 2L && wav.getInt(2) == 4)
      Seq(
        (3L, mm.pngFile(2, 1, alpha = false,
          (x, _) => (10 * (x + 1), 0, 5, 0))),
        (4L, graft.functions.Gunzip.gzipBytes(
          "hola mundo".getBytes("UTF-8"))))
        .toDF("id", "b").createOrReplaceTempView("media2")
      val png = spark2.sql(
        """SELECT png_pixel_stats(b).sum_r AS sr,
          |  png_pixel_stats(b).n_pixels AS np
          |FROM media2 WHERE id = 3""".stripMargin).collect().head
      assert(png.getLong(0) == 30L && png.getLong(1) == 2L)
      val gz = spark2.sql(
        """SELECT gunzip_text(b) AS t, length(gunzip(b)) AS n
          |FROM media2 WHERE id = 4""".stripMargin).collect().head
      assert(gz.getString(0) == "hola mundo" && gz.getInt(1) == 10)
      val txt = spark2.sql(
        "SELECT nfc_normalize('we\u0301') AS n, " +
        "jaro_winkler_similarity('martha', 'marhta') AS jw, " +
        "jaro_similarity('dixon', 'dicksonx') AS j")
        .collect().head
      assert(txt.getString(0) == "w\u00e9")
      assert(txt.getDouble(1) == 0.9611111111111111)
      assert(txt.getDouble(2) == 0.7666666666666666)
    } finally spark2.stop()
  }

  test("maintenance verbs parse and execute; history reflects them") {
    val spark2 = sessionWithExtensions
    try {
      import graft.core.VersionedTable
      import spark2.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("sqlverbs").toString
      val t = s"$root/t"
      VersionedTable.commitAppend(
        Seq((1L, "a"), (2L, "b")).toDF("id", "p"), t)
      VersionedTable.commitAppend(
        Seq((3L, "c"), (4L, "d")).toDF("id", "p"), t)

      val det = spark2.sql(s"DESCRIBE DETAIL '$t'").collect().head
      assert(det.getInt(1) === 2 && det.getInt(2) >= 1 &&
        det.getLong(3) > 0L)

      // OPTIMIZE = bin-pack compaction: a fresh version, rows intact
      val opt = spark2.sql(s"OPTIMIZE '$t'").collect().head
      assert(opt.getString(1) === "compact" && opt.getInt(2) === 3)
      assert(VersionedTable.read(spark2, t).count() === 4L)

      // OPTIMIZE ZORDER BY: Morton re-layout + stats sidecar
      val z = spark2.sql(s"OPTIMIZE '$t' ZORDER BY (id) PARTITIONS 2")
        .collect().head
      assert(z.getString(1) === "zorder(id)" && z.getInt(2) === 4)
      assert(VersionedTable.read(spark2, t).count() === 4L)

      // RESTORE: back to the first append, as a NEW version
      val rs = spark2.sql(s"RESTORE '$t' TO VERSION AS OF 1")
        .collect().head
      assert(rs.getInt(2) === 5)
      assert(VersionedTable.read(spark2, t)
        .select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
      // history is intact: the pre-restore snapshot still reads
      assert(VersionedTable.read(spark2, t, Some(4)).count() === 4L)

      // FORGET: copy-on-write delete through the takedown path
      val fg = spark2.sql(
        s"FORGET IDS (1) KEY id OP 9 BASE '$t'").collect().head
      assert(fg.getInt(0) === 1 && fg.getInt(1) === 6)
      assert(VersionedTable.read(spark2, t)
        .select("id").as[Long].collect().toSeq === Seq(2L))

      // VACUUM FORCE: history beyond the retained window is gone
      spark2.sql(s"VACUUM '$t' RETAIN 1 VERSIONS FORCE")
      assert(VersionedTable.read(spark2, t).count() === 1L)
      intercept[Exception] {
        VersionedTable.read(spark2, t, Some(4)).count()
      }

      // CLONE: metadata-only fork reads the same rows. AFTER the
      // source vacuum on purpose — cloning then vacuuming the source
      // is the documented shared-fate hazard (cloneFrom scaladoc)
      val cl = spark2.sql(s"CLONE '$t' TO '$root/dev'").collect().head
      assert(cl.getInt(2) === 1)
      assert(VersionedTable.read(spark2, s"$root/dev").count() === 1L)

      // ERASE: the one-call physical loop (base-only here; the full
      // index loop is TakedownSpec's erase test)
      val er = spark2.sql(s"ERASE OP 10 BASE '$root/dev' FORCE")
        .collect().head
      assert(er.getInt(0) === 1)
      assert(VersionedTable.read(spark2, s"$root/dev").count() === 1L)

      // a non-maintenance statement still parses through the delegate
      assert(spark2.sql("SELECT 1 + 1 AS two").collect().head
        .getInt(0) === 2)

      // REPLACE WHERE: selective overwrite of one window from a
      // staged source table, untouched rows intact
      val staged = s"$root/staged"
      VersionedTable.commitOverwrite(
        Seq((2L, "B2")).toDF("id", "p"), staged)
      val rw = spark2.sql(
        s"REPLACE '$t' WHERE id = 2 FROM '$staged'").collect().head
      assert(rw.getInt(1) >= 1)
      assert(VersionedTable.read(spark2, t)
        .orderBy("id").collect().map(r =>
          (r.getLong(0), r.getString(1))).toSeq
        .contains((2L, "B2")))

      // FORGET with zero surfaces must error, not silently no-op —
      // the write-side compliance guard surfacing through SQL
      val e = intercept[Exception] {
        spark2.sql("FORGET IDS (1) KEY id OP 11").collect()
      }
      assert(e.getMessage.contains("at least one surface"))

      // a malformed maintenance verb (unquoted path) is NOT ours: it
      // falls through to the delegate and fails as plain Spark SQL,
      // never as a half-matched graft command
      intercept[Exception] {
        spark2.sql(s"OPTIMIZE $t").collect()
      }
    } finally spark2.stop()
  }

  test("REPLACE predicate containing a ' FROM ' literal parses intact") {
    // parser-level pin for the GREEDY source clause: the regex must
    // bind the LAST " FROM '…'" before end-of-statement, so a
    // predicate string literal containing the token sequence cannot
    // steal the source path (and run REPLACE against the wrong window)
    val plan = graft.sql.GraftSqlParser.maintenancePlan(
      "REPLACE '/tmp/t' WHERE src = 'x FROM y' FROM '/tmp/src'")
    val cmd = plan.get.asInstanceOf[graft.sql.ReplaceWhereCommand]
    assert(cmd.path === "/tmp/t")
    assert(cmd.predicateSql === "src = 'x FROM y'")
    assert(cmd.srcPath === "/tmp/src")
    // trailing semicolon + whitespace still anchor correctly
    val plan2 = graft.sql.GraftSqlParser.maintenancePlan(
      "REPLACE '/tmp/t' WHERE day = 7 FROM '/tmp/s' ; ")
    assert(plan2.get.asInstanceOf[graft.sql.ReplaceWhereCommand]
      .srcPath === "/tmp/s")
  }

  test("REFRESH SMOOTHED VIEW maintains the time-series gold from SQL") {
    val spark2 = sessionWithExtensions
    try {
      import graft.core.VersionedTable
      import spark2.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("sqlsmooth").toString
      val (base, gold) = (s"$root/base", s"$root/gold")
      def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
      VersionedTable.commitAppend(
        Seq(("a", ts(400000L), 10.0), ("a", ts(2100000L), 30.0))
          .toDF("k", "t", "v"), base)
      val verb = s"REFRESH SMOOTHED VIEW '$gold' FROM '$base' " +
        "KEY k TIME t VALUE v STEP 1000000 ALPHA 0.3"
      val r1 = spark2.sql(verb).collect().head
      assert(r1.getString(1) === "init")
      // strictly-later observations extend by delta from SQL too
      VersionedTable.commitAppend(
        Seq(("a", ts(4700000L), 50.0)).toDF("k", "t", "v"), base)
      val r2 = spark2.sql(verb).collect().head
      assert(r2.getString(1) === "incremental" && r2.getInt(3) >= 1)
      assert(spark2.sql(verb).collect().head.getString(1) === "noop")
      val got = graft.ops.TimeSeriesView.read(spark2, gold)
        .orderBy("g_us").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      val twin = graft.ops.TimeSeriesView.smoothedBatch(
          VersionedTable.read(spark2, base), Seq("k"), "t", "v",
          1000000L, 0.3)
        .orderBy("g_us").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      assert(got.toSeq === twin.toSeq)
    } finally spark2.stop()
  }

  test("REFRESH ANOMALY VIEW maintains the alert log from SQL") {
    val spark2 = sessionWithExtensions
    try {
      import graft.core.VersionedTable
      import spark2.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("sqlanomaly").toString
      val (base, log) = (s"$root/base", s"$root/log")
      def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
      VersionedTable.commitAppend(
        Seq(("a", ts(1L), 10.0), ("a", ts(2L), 12.0))
          .toDF("k", "t", "v"), base)
      val verb = s"REFRESH ANOMALY VIEW '$log' FROM '$base' " +
        "KEY k TIME t VALUE v ALPHA 0.25 THRESHOLD 3.0"
      val r1 = spark2.sql(verb).collect().head
      assert(r1.getString(1) === "init")
      // strictly-later observations extend by delta from SQL too
      VersionedTable.commitAppend(
        Seq(("a", ts(3L), 11.0), ("a", ts(4L), 60.0))
          .toDF("k", "t", "v"), base)
      val r2 = spark2.sql(verb).collect().head
      assert(r2.getString(1) === "incremental" && r2.getInt(3) >= 1)
      assert(spark2.sql(verb).collect().head.getString(1) === "noop")
      val got = graft.ops.AnomalyView.read(spark2, log)
        .orderBy("t_us").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(4)))
      val twin = graft.ops.AnomalyView.anomalyBatch(
          VersionedTable.read(spark2, base), Seq("k"), "t", "v",
          0.25, 3.0)
        .orderBy("t_us").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(4)))
      assert(got.toSeq === twin.toSeq)
      assert(got.last._3, "the spike must flag from the SQL surface")
    } finally spark2.stop()
  }

  test("REFRESH OHLC VIEW maintains downsampling bars from SQL") {
    val spark2 = sessionWithExtensions
    try {
      import graft.core.VersionedTable
      import spark2.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("sqlohlc").toString
      val (base, gold) = (s"$root/base", s"$root/gold")
      def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
      VersionedTable.commitAppend(
        Seq(("a", ts(1L), 5.0), ("a", ts(4L), 9.0))
          .toDF("k", "t", "v"), base)
      val verb = s"REFRESH OHLC VIEW '$gold' FROM '$base' " +
        "KEY k TIME t VALUE v BUCKET 10000000"
      val r1 = spark2.sql(verb).collect().head
      assert(r1.getString(1) === "init")
      // a strictly-later delta extends the open bar from SQL too
      VersionedTable.commitAppend(
        Seq(("a", ts(7L), 11.0)).toDF("k", "t", "v"), base)
      val r2 = spark2.sql(verb).collect().head
      assert(r2.getString(1) === "incremental" && r2.getInt(3) >= 1)
      assert(spark2.sql(verb).collect().head.getString(1) === "noop")
      val bar = graft.ops.OhlcView.read(spark2, gold).collect().head
      assert(bar.getLong(2) == 3L && bar.getDouble(5) == 5.0 &&
        bar.getDouble(6) == 11.0 && bar.getDouble(8) == 11.0,
        bar.toString)
    } finally spark2.stop()
  }

  test("REFRESH AUC VIEW maintains the monitoring view and returns " +
    "the verdict") {
    val spark2 = sessionWithExtensions
    try {
      import graft.core.VersionedTable
      import spark2.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("sqlauc").toString
      val (base, agg) = (s"$root/base", s"$root/agg")
      // a perfect separator: positives score 8-9, negatives 1-2
      VersionedTable.commitAppend(
        Seq((9L, 1), (8L, 1), (2L, 0)).toDF("s", "y"), base)
      val verb = s"REFRESH AUC VIEW '$agg' FROM '$base' SCORE s LABEL y"
      val r1 = spark2.sql(verb).collect().head
      assert(r1.getString(1) === "init")
      assert(r1.getDouble(4) == 1.0 && r1.getLong(5) == 2L)
      // an append refreshes from the delta and updates the verdict:
      // a negative at score 8 ties one positive -> 3.5 of 4 pairs won
      VersionedTable.commitAppend(Seq((8L, 0)).toDF("s", "y"), base)
      val r2 = spark2.sql(verb).collect().head
      assert(r2.getString(1) === "incremental")
      assert(r2.getDouble(4) == 0.875)
      assert(r2.getLong(5) == 2L && r2.getLong(6) == 2L)
      // the SQL verdict is the one-shot math, bit for bit
      val oneShot = graft.ops.MlEval.rocAuc(
        VersionedTable.read(spark2, base),
        org.apache.spark.sql.functions.col("s"),
        org.apache.spark.sql.functions.col("y"))
        .collect().head.getAs[Double]("auc")
      assert(r2.getDouble(4) == oneShot)
    } finally spark2.stop()
  }

  test("REFRESH KS VIEW maintains the histogram from deltas and " +
    "returns the drift verdict") {
    val spark2 = sessionWithExtensions
    try {
      import graft.core.VersionedTable
      import spark2.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("sqlks").toString
      val (base, agg, ref) = (s"$root/base", s"$root/agg", s"$root/ref")
      // persisted reference histogram: values {1,2,3} once each
      VersionedTable.commitAppend(
        Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("v", "n"), ref)
      VersionedTable.commitAppend(
        Seq(2L, 3L).map(Tuple1(_)).toDF("x"), base)
      val verb =
        s"REFRESH KS VIEW '$agg' FROM '$base' VALUE x AGAINST '$ref'"
      // ref {1,2,3} vs cur {2,3}: the max cross-multiplied gap is 2 of
      // tr*tc = 6, first attained at v = 1
      val r1 = spark2.sql(verb).collect().head
      assert(r1.getString(1) === "init")
      assert(r1.getLong(4) == 3L && r1.getLong(5) == 2L)
      assert(r1.getLong(6) == 1L && r1.getDouble(7) == 0.333333)
      // an append refreshes the histogram from the DELTA only and the
      // verdict updates: cur {2,3,4} -> gap 3 of 9 at v = 1
      VersionedTable.commitAppend(Seq(4L).map(Tuple1(_)).toDF("x"), base)
      val r2 = spark2.sql(verb).collect().head
      assert(r2.getString(1) === "incremental")
      assert(r2.getLong(4) == 3L && r2.getLong(5) == 3L)
      assert(r2.getDouble(7) == 0.333333)
      // ... and the verdict equals the one-shot ks on the raw window
      // the ref table's counts are all 1, so its raw v values ARE the
      // reference sample
      val oneShot = graft.ops.DriftMonitor.ks(
        VersionedTable.read(spark2, ref).selectExpr("v AS x"),
        VersionedTable.read(spark2, base), "x")
        .collect().head.getAs[Double]("ks")
      assert(r2.getDouble(7) == oneShot)
    } finally spark2.stop()
  }

  test("REFRESH KS VIEW exposes the spine-guard knobs: MAX SUPPORT " +
    "refuses from SQL, COARSEN TO re-buckets from SQL") {
    val spark2 = sessionWithExtensions
    try {
      import graft.core.VersionedTable
      import spark2.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("sqlksguard").toString
      val (base, agg, ref) = (s"$root/base", s"$root/agg", s"$root/ref")
      // 64-point reference, 64-point shifted current: joint support
      // 96 — over a MAX SUPPORT 50 guard
      VersionedTable.commitAppend(
        (1L to 64L).map((_, 1L)).toDF("v", "n"), ref)
      VersionedTable.commitAppend(
        (33L to 96L).map(Tuple1(_)).toDF("x"), base)
      // refusal carries the library's actionable message through SQL
      val e = intercept[Exception] {
        spark2.sql(s"REFRESH KS VIEW '$agg' FROM '$base' VALUE x " +
          s"AGAINST '$ref' MAX SUPPORT 50").collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).take(10)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
      assert(msgs.exists(_.contains("distinct points")),
        s"SQL caller must get the guard's message: ${msgs.mkString(" | ")}")
      // COARSEN TO takes the same path the library caller gets:
      // verdict matches ksGuarded with identical knobs, bit for bit
      val r = spark2.sql(s"REFRESH KS VIEW '$agg' FROM '$base' VALUE x " +
        s"AGAINST '$ref' MAX SUPPORT 50 COARSEN TO 32").collect().head
      val lib = graft.ops.DriftMonitor.ksGuarded(
        VersionedTable.read(spark2, ref)
          .selectExpr("CAST(v AS BIGINT) AS v", "CAST(n AS BIGINT) AS n"),
        graft.ops.IncrementalAgg.read(spark2, agg)
          .selectExpr("CAST(x AS BIGINT) AS v", "n_rows AS n"),
        maxSupport = 50, coarsenTo = 32).collect().head
      assert(r.getLong(4) == lib.getAs[Long]("n_ref") &&
        r.getLong(5) == lib.getAs[Long]("n_cur"))
      assert(r.getLong(6) == lib.getAs[Long]("ks_at"))
      assert(r.getDouble(7) == lib.getAs[Double]("ks"))
      assert(r.getDouble(8) == lib.getAs[Double]("ks_hi"))
      // the two-sided coarse verdict brackets the exact statistic
      val exact = graft.ops.DriftMonitor.ks(
        VersionedTable.read(spark2, ref).selectExpr("v AS x"),
        VersionedTable.read(spark2, base), "x")
        .collect().head.getAs[Double]("ks")
      assert(r.getDouble(7) <= exact + 1e-9 &&
        r.getDouble(8) >= exact - 1e-9,
        s"[${r.getDouble(7)}, ${r.getDouble(8)}] must bracket $exact")
    } finally spark2.stop()
  }

  test("REFRESH AUC VIEW on an empty base returns a null-auc row, " +
    "not an NPE") {
    val spark2 = sessionWithExtensions
    try {
      import graft.core.VersionedTable
      import spark2.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("sqlaucempty").toString
      val (base, agg) = (s"$root/base", s"$root/agg")
      // a committed-but-empty base: the view's global aggregate yields
      // one row of NULL sums, which must surface as (auc=null, 0, 0)
      // — not an opaque NullPointerException from the SQL statement
      VersionedTable.commitAppend(
        Seq.empty[(Long, Int)].toDF("s", "y"), base)
      val r = spark2.sql(
        s"REFRESH AUC VIEW '$agg' FROM '$base' SCORE s LABEL y")
        .collect().head
      assert(r.isNullAt(4), "auc must be null while classes are absent")
      assert(r.getLong(5) == 0L && r.getLong(6) == 0L)
    } finally spark2.stop()
  }

  test("REFRESH VIEW maintains (join-)aggregate views from SQL") {
    val spark2 = sessionWithExtensions
    try {
      import graft.core.VersionedTable
      import spark2.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("sqlrefresh").toString
      val (base, agg) = (s"$root/base", s"$root/agg")
      VersionedTable.commitAppend(
        Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("k", "g", "v"), base)
      val r1 = spark2.sql(
        s"REFRESH VIEW '$agg' FROM '$base' GROUP BY g VALUE v")
        .collect().head
      assert(r1.getString(1) === "init")
      // an append advances by DELTA, visible from the SQL shell
      VersionedTable.commitAppend(
        Seq((3L, "x", 5L)).toDF("k", "g", "v"), base)
      val r2 = spark2.sql(
        s"REFRESH VIEW '$agg' FROM '$base' GROUP BY g VALUE v")
        .collect().head
      assert(r2.getString(1) === "incremental" && r2.getInt(3) >= 1)
      val rows = graft.ops.IncrementalAgg.read(spark2, agg)
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getAs[Long]("n_rows"),
          r.getAs[Long]("sum_val")))
      assert(rows.toSeq === Seq(("x", 2L, 15L), ("y", 1L, 20L)))
      // MINMAX flavor
      val aggM = s"$root/aggm"
      spark2.sql(
        s"REFRESH VIEW '$aggM' FROM '$base' GROUP BY g VALUE v MINMAX")
      val mm = graft.ops.IncrementalAgg.read(spark2, aggM)
      assert(mm.columns.contains("min_val") &&
        mm.columns.contains("max_val"))
      // JOIN view: enrichment rollup by a dim attribute
      val (dim, aggJ) = (s"$root/dim", s"$root/aggj")
      VersionedTable.commitAppend(
        Seq(("x", 100L), ("y", 200L)).toDF("g", "region"), dim)
      val rj = spark2.sql(s"REFRESH VIEW '$aggJ' FROM '$base' " +
        s"JOIN '$dim' ON g GROUP BY region VALUE v").collect().head
      assert(rj.getString(1) === "init")
      val jr = graft.ops.IncrementalAgg.read(spark2, aggJ)
        .orderBy("region").collect()
        .map(r => (r.getAs[Long]("region"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("sum_val")))
      assert(jr.toSeq === Seq((100L, 2L, 15L), (200L, 1L, 20L)))
      // unchanged base+dim: the SQL verb reports the no-op honestly
      assert(spark2.sql(s"REFRESH VIEW '$aggJ' FROM '$base' " +
        s"JOIN '$dim' ON g GROUP BY region VALUE v").collect().head
        .getString(1) === "noop")
      // MINMAX on a JOIN view is refused loudly (state shape has no
      // extrema), not silently dropped
      val e = intercept[Exception] {
        spark2.sql(s"REFRESH VIEW '$aggJ' FROM '$base' " +
          s"JOIN '$dim' ON g GROUP BY region VALUE v MINMAX").collect()
      }
      assert(e.getMessage.contains("MINMAX"))
    } finally spark2.stop()
  }
}
