package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityClassifier, SpanDedup}

class SpanQualitySpec extends SparkTestBase {
  import spark.implicits._

  // ---- SpanDedup ------------------------------------------------------

  test("dup-span fraction: shared and unique windows") {
    val df = Seq(
      (1L, "a b c d e f"), // windows: "a b c d e", "b c d e f"
      (2L, "a b c d e"),   // single window, shared with doc1
      (3L, "x y z"),       // <5 tokens -> whole-stream window
      (4L, "x y z"))       // exact dup of doc3's window
      .toDF("doc_id", "text")
    val out = SpanDedup.dupSpanStats(df, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 1L, 1L, 1.0),
      (3L, 1L, 1L, 1.0),
      (4L, 1L, 1L, 1.0)))
  }

  test("dup-span: in-doc repeats count once, alone in corpus -> 0 dup") {
    val df = Seq((1L, "a b c d e a b c d e a b c d e"))
      .toDF("doc_id", "text")
    val r = SpanDedup.dupSpanStats(df, "doc_id", "text", k = 5)
      .collect()(0)
    // 11 window positions but only 5 distinct cyclic windows
    assert(r.getLong(1) == 5L && r.getLong(2) == 0L &&
      r.getDouble(3) == 0.0)
  }

  // ---- Blocklist ------------------------------------------------------

  test("blocklist: substring hits across token boundaries, list order") {
    val df = Seq(
      (1L, "totally clean document"),
      (2L, "contains bad phrase here"),
      (3L, "bad phrase and also worse phrase"))
      .toDF("doc_id", "text")
    val out = graft.operators.Blocklist.flagPhrases(df, "doc_id",
      "text", Seq("worse phrase", "bad phrase"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, None, false),
      (2L, 1L, Some("bad phrase"), true),
      // first_hit follows BLOCKLIST order, not text order
      (3L, 2L, Some("worse phrase"), true)))
  }

  test("blocklist flagging plans zero exchanges (narrow map)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = graft.operators.Blocklist.flagPhrases(df, "doc_id",
      "text", Seq("x"))
    out.collect()
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty, s"blocklist shuffled: $exchanges")
  }

  test("Aho-Corasick matches equal the naive per-phrase contains scan") {
    // property: over random texts and overlapping phrase lists, the
    // automaton's hit set (distinct, blocklist order) is exactly the
    // per-phrase `contains` filter's — including phrases that are
    // prefixes/suffixes/infixes of each other, which exercise the
    // fail links
    val rnd = new scala.util.Random(13)
    val alphabet = "abc "
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    (1 to 40).foreach { _ =>
      val phrases = scala.util.Random.shuffle(
        (1 to (2 + rnd.nextInt(5)))
          .map(_ => randStr(1 + rnd.nextInt(5))).distinct.toList)
      val texts = (1 to 20).map(i => (i.toLong, randStr(rnd.nextInt(30))))
      val df = texts.toDF("doc_id", "text")
      val viaAc = graft.operators.Blocklist
        .flagPhrases(df, "doc_id", "text", phrases)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(1), Option(r.getString(2))))
      val naive = texts.sortBy(_._1).map { case (_, t) =>
        val hits = phrases.filter(t.contains)
        (hits.length.toLong, hits.headOption)
      }
      assert(viaAc.toSeq == naive,
        s"phrases=$phrases texts=${texts.take(3)}")
    }
  }

  test("table-driven blocklist: parquet phrase table, lexicographic order") {
    val docs = Seq(
      (1L, "totally clean document"),
      (2L, "contains bad phrase here"),
      (3L, "bad phrase and also worse phrase"))
      .toDF("doc_id", "text")
    // phrase TABLE (with dupes, a null, and an empty row to clean)
    val dir = java.nio.file.Files.createTempDirectory("bl").toString
    Seq(Some("worse phrase"), Some("bad phrase"), Some("bad phrase"),
      None, Some("")).toDF("phrase").write.parquet(s"$dir/p")
    val phrases = spark.read.parquet(s"$dir/p")
    val out = graft.operators.Blocklist.flagPhrasesFrom(
      docs, "doc_id", "text", phrases, "phrase")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, None, false),
      (2L, 1L, Some("bad phrase"), true),
      // lexicographic blocklist order: "bad phrase" < "worse phrase"
      (3L, 2L, Some("bad phrase"), true)))
  }

  test("table-driven blocklist enforces the automaton size cap") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val phrases = Seq("aaaaaaaaaa", "bbbbbbbbbb").toDF("phrase")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Blocklist.flagPhrasesFrom(
        docs, "doc_id", "text", phrases, "phrase",
        maxPhraseChars = 15L)
    }
    assert(e.getMessage.contains("automaton cap"))
  }

  test("Aho-Corasick matches raw UTF-8 bytes, incl. invalid sequences") {
    // the automaton runs over UTF8String BYTES — the alphabet the
    // per-phrase UTF8String.contains it replaces compares. A document
    // carrying invalid UTF-8 (truncated multi-byte sequence, stray
    // continuation byte) must match exactly as byte-contains does; a
    // decoded-String scan would U+FFFD-replace the bad bytes and
    // could diverge
    import org.apache.spark.unsafe.types.UTF8String
    val phrases = Seq("bad", "péché")
    val expr = graft.functions.AhoContains(
      org.apache.spark.sql.GraftBridge.expression(
        org.apache.spark.sql.functions.col("text")), phrases)
    val utf8Phrases = phrases.map(UTF8String.fromString)
    def viaAc(bytes: Array[Byte]): Seq[String] = {
      val arr = expr.matchesOf(UTF8String.fromBytes(bytes))
      (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString)
    }
    def naive(bytes: Array[Byte]): Seq[String] = {
      val s = UTF8String.fromBytes(bytes)
      phrases.zip(utf8Phrases).filter(p => s.contains(p._2)).map(_._1)
    }
    val cases = Seq[Array[Byte]](
      "clean bad text".getBytes("UTF-8"),
      "un péché véniel".getBytes("UTF-8"),
      // invalid: stray continuation byte inside, then a real phrase
      Array[Byte](0x80.toByte) ++ "bad".getBytes("UTF-8"),
      // invalid: truncated 2-byte sequence (é = C3 A9 missing A9)
      // right before a phrase — must not shift/replace bytes
      "p".getBytes("UTF-8") ++ Array[Byte](0xC3.toByte) ++
        "bad".getBytes("UTF-8"),
      // phrase bytes split by a lone 0xFF must NOT match
      "ba".getBytes("UTF-8") ++ Array[Byte](0xFF.toByte) ++
        "d".getBytes("UTF-8"))
    cases.foreach { b =>
      assert(viaAc(b) == naive(b),
        s"bytes=${b.map(x => f"$x%02x").mkString(" ")}")
    }
  }

  // ---- QualityClassifier ----------------------------------------------

  private def corpus = Seq(
    // positives: longer, diverse, stopword-bearing
    (1L, "the quick brown fox jumps over the lazy dog and runs on", true),
    (2L, "a curious reader walks in the park with an open book", true),
    (3L, "it was the best of times and it was a bright day for all", true),
    // negatives: short / degenerate repetition
    (4L, "spam spam spam spam spam spam", false),
    (5L, "buy buy buy", false),
    (6L, "zz", false))
    .toDF("doc_id", "text", "pos")

  test("classifier separates diverse stopword-rich docs from spam") {
    val scored = QualityClassifier.scoreDF(corpus, "doc_id", "text",
      col("pos"), iters = 30)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        r.getDouble(2))).toSeq.sortBy(_._1)
    val posMean = scored.filter(_._2).map(_._3).sum / 3
    val negMean = scored.filterNot(_._2).map(_._3).sum / 3
    assert(posMean > negMean,
      s"positives should score higher: $posMean vs $negMean")
    scored.foreach { case (_, _, s) =>
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("stream scoring with batch-trained weights matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val feats = QualityClassifier.featureFrame(corpus, "doc_id",
      "text", col("pos"))
    val w = QualityClassifier.train(feats, iters = 10)
    val batch = QualityClassifier
      .scoreWith(corpus, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getBoolean(2))).toSeq.sortBy(_._1)
    val mem = MemoryStream[(Long, String)]
    mem.addData(corpus.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
    val q = QualityClassifier.scoreWith(
      mem.toDF.toDF("doc_id", "text"), "doc_id", "text", w)
      .writeStream.format("memory").queryName("qc_scores")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qc_scores")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getBoolean(2))).toSeq.sortBy(_._1)
    assert(streamed == batch)
  }

  test("trained weights are independent of partitioning") {
    val feats = QualityClassifier.featureFrame(corpus, "doc_id",
      "text", col("pos"))
    val w2 = QualityClassifier.train(feats.repartition(2), iters = 5)
    val w7 = QualityClassifier.train(feats.repartition(7), iters = 5)
    // integer-summed gradients: bit-identical, not approximately equal
    assert(w2.toSeq == w7.toSeq)
  }
}
