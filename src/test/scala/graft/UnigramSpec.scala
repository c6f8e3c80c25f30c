package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{UnigramSegment, UnigramSegmentPieces}
import graft.operators.Unigram

/** Unigram-LM tokenizer: the Viterbi DP must equal a full enumeration
  * of all segmentations (independent spec, not the same DP twice),
  * the combined integer objective must decode back to (score, count),
  * and training must keep the single-char closure. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def seg(word: String, vocab: Map[String, Long],
      maxLen: Int = 4): Long =
    Seq(Tuple1(word)).toDF("w")
      .select(UnigramSegment.column(col("w"),
        vocab.keys.toSeq.sorted, vocab.keys.toSeq.sorted.map(vocab),
        maxLen))
      .collect().head.getLong(0)

  // all decompositions into vocab pieces (None when uncoverable)
  private def brute(word: String, vocab: Map[String, Long],
      maxLen: Int): Option[Long] =
    if (word.isEmpty) Some(0L)
    else (1 to math.min(maxLen, word.length)).flatMap { l =>
      vocab.get(word.take(l)).flatMap(sc =>
        brute(word.drop(l), vocab, maxLen)
          .map(rest => sc * 1024L - 1L + rest))
    }.reduceOption(_ max _)

  test("single best piece beats equal-score multi-piece (tie on score)") {
    val vocab = Map("ab" -> -700L, "a" -> -300L, "b" -> -400L)
    // "ab" alone: -700·1024-1; "a"+"b": -700·1024-2 — fewer pieces win
    assert(seg("ab", vocab) === -700L * 1024L - 1L)
  }

  test("objective decodes back to (score, count)") {
    val vocab = Map("ab" -> -700L, "a" -> -300L, "b" -> -400L)
    val v = seg("abab", vocab)
    val nv = -v
    val c = nv % 1024L
    val s = -((nv - c) / 1024L)
    assert(c === 2L && s === -1400L) // "ab"+"ab"
  }

  test("unknown characters charge the documented UNK penalty") {
    val vocab = Map("x" -> -100L)
    assert(seg("xy", vocab) ===
      (-100L + UnigramSegment.UnkScore) * 1024L - 2L)
    assert(seg("", vocab) === 0L)
  }

  test("non-BMP code points: DP aligns with code-point-trained vocab") {
    // U+1F600 is one code point but two UTF-16 units: a UTF-16-indexed
    // DP would try to match half a surrogate pair and fall to UNK
    val emoji = new String(Character.toChars(0x1F600))
    val vocab = Map(emoji -> -100L, "a" -> -200L,
      (emoji + "a") -> -50L)
    assert(seg(emoji + "a", vocab) === -50L * 1024L - 1L)
    assert(seg(emoji, vocab) === -100L * 1024L - 1L)
    // an unknown non-BMP char is ONE UNK charge, not two
    val other = new String(Character.toChars(0x1F4A9))
    assert(seg(other, Map("a" -> -1L)) ===
      UnigramSegment.UnkScore * 1024L - 1L)
  }

  test("property: Viterbi equals full enumeration on coverable words") {
    val chars = Seq("a", "b", "c")
    val pieceGen = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(chars)).map(_.mkString))
    val caseGen = for {
      extra <- Gen.listOfN(6, pieceGen)
      scores <- Gen.listOfN(extra.size + 3, Gen.choose(-9000L, -10L))
      wordPieces <- Gen.choose(1, 5).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(chars ++ extra)))
    } yield {
      val vocab = (chars ++ extra).distinct.zip(scores).toMap
      (vocab, wordPieces.mkString)
    }
    for (i <- 0 until 30) {
      val (vocab, word) =
        caseGen.pureApply(Gen.Parameters.default, Seed(i))
      val got = seg(word, vocab, maxLen = 3)
      val want = brute(word, vocab, maxLen = 3)
      assert(Some(got) === want, s"seed=$i word=$word vocab=$vocab")
    }
  }

  test("pieceVocab: single-char closure, weighting, kept-set scores") {
    val docs = Seq((1L, "abab ab"), (2L, "abab cd")).toDF("id", "text")
    val v = Unigram.pieceVocab(docs, "text", vocabSize = 3,
        maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPiece = v.map(x => x._1 -> x).toMap
    // every character of the corpus is present even beyond top-3
    for (ch <- Seq("a", "b", "c", "d"))
      assert(byPiece.contains(ch), s"missing single-char '$ch'")
    // substring weighting: "ab" occurs twice in each "abab" (x2 docs)
    // and once in "ab" -> 5
    assert(byPiece("ab")._2 === 5L)
    // scores are negative log-probs; exactness pinned by replay below
    val total = v.map(_._2).sum
    v.foreach { case (_, _, sc) => assert(sc < 0L) }
    // exact replay of one score through the same SQL-rounding path
    val expected = docs.sparkSession.range(1).select(
      round(log(lit(byPiece("ab")._2.toDouble) / total.toDouble)
        * 1e6, 0).cast("long")).collect().head.getLong(0)
    assert(byPiece("ab")._3 === expected)
  }

  private def segPieces(word: String, vocab: Map[String, Long],
      maxLen: Int = 4): Seq[String] =
    Seq(Tuple1(word)).toDF("w")
      .select(UnigramSegmentPieces.column(col("w"),
        vocab.keys.toSeq.sorted, vocab.keys.toSeq.sorted.map(vocab),
        maxLen))
      .collect().head.getSeq[String](0)

  // every decomposition into vocab pieces, as piece lists
  private def bruteLists(word: String, vocab: Map[String, Long],
      maxLen: Int): Seq[List[String]] =
    if (word.isEmpty) Seq(Nil)
    else (1 to math.min(maxLen, word.length)).flatMap { l =>
      val p = word.take(l)
      if (vocab.contains(p))
        bruteLists(word.drop(l), vocab, maxLen).map(p :: _)
      else Nil
    }

  private def objective(lst: Seq[String], vocab: Map[String, Long]): Long =
    lst.map(vocab).sum * 1024L - lst.size

  // canonical = max objective, then lex-smallest piece list — the
  // exact ORDER BY val DESC, lst ASC the q182 oracle runs
  private def canonical(word: String, vocab: Map[String, Long],
      maxLen: Int): List[String] = {
    val all = bruteLists(word, vocab, maxLen)
    val best = all.map(objective(_, vocab)).max
    implicit val lex: Ordering[List[String]] =
      Ordering.Implicits.seqOrdering[List, String]
    all.filter(objective(_, vocab) == best).min
  }

  test("canonical pieces: tie on objective resolves lex-smallest") {
    // ["a","bc"] and ["ab","c"] tie at -1000·1024-2; "a" < "ab" lex
    val vocab = Map("a" -> -300L, "bc" -> -700L,
      "ab" -> -600L, "c" -> -400L)
    assert(segPieces("abc", vocab) === Seq("a", "bc"))
    // and the emitted array's objective equals the value DP's optimum
    assert(objective(Seq("a", "bc"), vocab) === seg("abc", vocab))
  }

  test("property: canonical pieces equal full-enumeration canonical") {
    val chars = Seq("a", "b")
    val pieceGen = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(chars)).map(_.mkString))
    val caseGen = for {
      extra <- Gen.listOfN(5, pieceGen)
      scores <- Gen.listOfN(extra.size + 2, Gen.choose(-900L, -10L))
      wordPieces <- Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(chars ++ extra)))
    } yield {
      val vocab = (chars ++ extra).distinct.zip(scores).toMap
      (vocab, wordPieces.mkString)
    }
    for (i <- 0 until 30) {
      val (vocab, word) =
        caseGen.pureApply(Gen.Parameters.default, Seed(100 + i))
      val got = segPieces(word, vocab, maxLen = 3)
      val want = canonical(word, vocab, maxLen = 3)
      assert(got === want, s"seed=$i word=$word vocab=$vocab")
      assert(got.mkString === word)
      assert(objective(got, vocab) === seg(word, vocab, maxLen = 3))
    }
  }

  test("pieceVocabEm: usage-driven prune, single-char floor, re-score") {
    val docs = Seq((1L, "abab ab"), (2L, "abab cd")).toDF("id", "text")
    // initial kept set {a:5, ab:5, b:5, c:1, d:1}; canonical
    // segmentations: "abab"->[ab,ab] (fewest pieces), "ab"->[ab],
    // "cd"->[c,d] => usage ab:5, c:1, d:1; a/b unused -> floor 1
    val v = Unigram.pieceVocabEm(docs, "text", vocabSize = 3,
        maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPiece = v.map(x => x._1 -> x).toMap
    assert(v.map(_._1).sorted === Seq("a", "ab", "b", "c", "d"))
    assert(byPiece("ab")._2 === 5L)
    assert(byPiece("a")._2 === 1L && byPiece("b")._2 === 1L)
    assert(byPiece("c")._2 === 1L && byPiece("d")._2 === 1L)
    // exact re-score replay through the same SQL-rounding path
    val total = v.map(_._2).sum
    val expected = docs.sparkSession.range(1).select(
      round(log(lit(5.0) / total.toDouble) * 1e6, 0).cast("long"))
      .collect().head.getLong(0)
    assert(byPiece("ab")._3 === expected)
  }

  test("pieceVocabEm: zero-usage multi-char pieces are pruned") {
    // corpus "ab ba ab ab": initial kept {a:4, b:4, ab:3, ba:1}. The
    // rare word "ba" segments CHEAPER as ["b","a"] (two frequent
    // chars, 2·ln(4/12) ≈ -2.20, beats ln(1/12) ≈ -2.48 even paying
    // the extra-piece tie-break), so the piece "ba" draws zero usage
    // and EM prunes it — the Kudo prune intent in one example. "ab"
    // is frequent enough that ["ab"] wins, so it survives with
    // usage 3; single chars floor in regardless
    val docs = Seq((1L, "ab ba ab ab")).toDF("id", "text")
    val init = Unigram.pieceVocab(docs, "text", vocabSize = 10,
      maxPieceLen = 2).collect().map(_.getString(0)).toSet
    assert(init === Set("a", "b", "ab", "ba"))
    val after = Unigram.pieceVocabEm(docs, "text", vocabSize = 10,
      maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after.keySet === Set("a", "b", "ab"))
    assert(after("ab") === 3L)
    // "b","a" are used once each by ["b","a"]; usage 1 each, not floor
    assert(after("a") === 1L && after("b") === 1L)
  }

  // brute-force forward-backward posterior for one word: enumerate
  // every segmentation path, weight by its probability product — an
  // INDEPENDENT derivation (path-sum, not the α/β DP), so agreement is
  // evidence the lattice recursions are right, up to the documented
  // per-occurrence 1e-6 quantization
  private def brutePosterior(word: String, p: Map[String, Double],
      maxLen: Int): Map[String, Double] = {
    def paths(s: String): Seq[(List[String], Double)] =
      if (s.isEmpty) Seq((Nil, 1.0))
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        val piece = s.take(l)
        p.get(piece).toSeq.flatMap(pp =>
          paths(s.drop(l)).map { case (rest, w) => (piece :: rest, pp * w) })
      }
    val all = paths(word)
    val z = all.map(_._2).sum
    all.flatMap { case (ps, w) => ps.map(_ -> w / z) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
  }

  test("expected usage: unique-segmentation corpus reproduces hard " +
    "counts exactly") {
    // vocab of single chars only: every word has exactly one path, so
    // every occurrence's posterior is 1.0 and usage is the plain char
    // count at the 1e6 scale
    val pieces = Seq("a", "b", "c")
    val cnts = Seq(5L, 3L, 2L)
    val rows = Seq(Tuple1("abca"), Tuple1("cb")).toDF("w")
      .select(col("w"), graft.functions.UnigramExpectedUsage
        .column(col("w"), pieces, cnts, 10L, 4).as("u"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => x.getString(0) -> x.getLong(1)).toMap).toMap
    assert(rows("abca") === Map("a" -> 2000000L, "b" -> 1000000L,
      "c" -> 1000000L))
    assert(rows("cb") === Map("c" -> 1000000L, "b" -> 1000000L))
  }

  test("expected usage agrees with independent path enumeration") {
    val pieces = Seq("a", "b", "ab", "ba", "aba")
    val cnts = Seq(10L, 6L, 8L, 2L, 1L)
    val total = 27L
    val p = pieces.zip(cnts).map { case (s, c) =>
      s -> (c.toDouble / total.toDouble) }.toMap
    val words = Seq("ab", "aba", "abab", "baab", "aabbaa")
    val got = words.map(Tuple1(_)).toDF("w")
      .select(col("w"), graft.functions.UnigramExpectedUsage
        .column(col("w"), pieces, cnts, total, 4).as("u"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => x.getString(0) -> x.getLong(1)).toMap).toMap
    words.foreach { w =>
      val expect = brutePosterior(w, p, 4)
      val have = got(w)
      assert(have.keySet === expect.keySet, w)
      expect.foreach { case (piece, e) =>
        // per-occurrence rounding: each occurrence contributes ±0.5
        // at the 1e-6 grid; a piece occurs at most |w| times
        assert(math.abs(have(piece) - e * 1e6) <= w.length + 1,
          s"$w/$piece: ${have(piece)} vs ${e * 1e6}")
      }
      // total expected pieces per word lies in [1, |w|] (in units)
      val tot = have.values.sum
      assert(tot >= 999990L && tot <= w.length * 1000000L + 10L, s"$w: $tot")
    }
  }

  test("soft E-step (trainSoftEm iters=1, no prune): soft credit " +
    "keeps what hard EM prunes, stays deterministic under partitioning") {
    // hard EM pruned "ba" (its only word segments cheaper as b+a);
    // soft EM gives every consistent path probability mass, so "ba"
    // survives with sub-unit expected usage — the Kudo-true behavior
    val docs = Seq((1L, "ab ba ab ab")).toDF("id", "text")
    val soft = Unigram.trainSoftEm(docs, "text", vocabSize = 10,
        maxPieceLen = 2, iters = 1, prune = false)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(soft.keySet === Set("a", "b", "ab", "ba"))
    val ba = soft("ba")._1
    assert(ba > 0L && ba < 1000000L,
      s"'ba' draws partial posterior mass, got $ba")
    // "ab" is 3 words' dominant path: close to (but below) 3 units
    assert(soft("ab")._1 > 2000000L && soft("ab")._1 < 3000000L)
    // single chars floor at one scaled unit
    assert(soft("a")._1 >= 1000000L && soft("b")._1 >= 1000000L)
    // partition-proof: the per-word quantization makes the corpus
    // aggregation exact integer arithmetic
    val again = Unigram.trainSoftEm(docs.repartition(7), "text",
        vocabSize = 10, maxPieceLen = 2, iters = 1, prune = false)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(again === soft)
  }

  test("trainSoftEm: singles always survive, prune drops the " +
    "lowest-loss multi at the 0.75 shrink, target floors the cut") {
    // four multi-char candidates: "ab" dominates (4 words), cd/ef/gh
    // appear once each and tie on loss — the shrink keeps
    // ceil(3·4/4) = 3, so exactly one of the tied tail (lex-largest
    // "gh") is pruned, deterministically
    val docs = Seq((1L, "ab ab ab ab cd ef gh")).toDF("id", "text")
    val base = Unigram.trainSoftEm(docs, "text", vocabSize = 20,
        maxPieceLen = 2, iters = 1, prune = false)
      .collect().map(r => r.getString(0)).toSet
    val singles = base.filter(_.length == 1)
    val multis = base.filter(_.length > 1)
    assert(multis == Set("ab", "cd", "ef", "gh"), s"setup: $multis")
    val one = Unigram.trainSoftEm(docs, "text", vocabSize = 20,
        maxPieceLen = 2, iters = 1, targetVocab = 0)
      .collect().map(r => r.getString(0)).toSet
    assert(singles.subsetOf(one), "single-char closure must survive")
    assert(one.filter(_.length > 1) == Set("ab", "cd", "ef"),
      s"keep ceil(3/4): ab (dominant) + lex-smaller of the tie: $one")
    // a target covering the whole vocab disables the cut
    val all = Unigram.trainSoftEm(docs, "text", vocabSize = 20,
        maxPieceLen = 2, iters = 1,
        targetVocab = singles.size + multis.size)
      .collect().map(r => r.getString(0)).toSet
    assert(all.count(_.length > 1) == multis.size,
      "target >= vocab must disable the cut")
    // two rounds stay deterministic under partitioning (the per-word
    // quantization contract carries through the loop)
    val two = Unigram.trainSoftEm(docs, "text", vocabSize = 20,
        maxPieceLen = 2, iters = 2, targetVocab = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val twoAgain = Unigram.trainSoftEm(docs.repartition(5), "text",
        vocabSize = 20, maxPieceLen = 2, iters = 2, targetVocab = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(two.toSeq == twoAgain.toSeq)
    // scores renormalize over the survivors: exp-sum of probabilities
    // stays ~1 (scaled-integer scores, so only approximately)
    val psum = two.map(r => math.exp(r._3 / 1e6)).sum
    assert(psum > 0.98 && psum < 1.02, s"scores must renormalize: $psum")
  }

  test("prune loss ranking: a piece cheaper than its own best " +
    "decomposition is pruned first; equal losses break by piece") {
    // hand-built scored vocab, 4 singles + 4 multis (shrink keeps 3):
    // "ab" scores WORSE than its own a+b decomposition with tiny
    // usage — negative loss, first out; "cd" is heavily used with a
    // poor decomposition — safest; "ad"/"cb" tie exactly
    val scored = Array(
      ("a", 5000000L, -900000L), ("b", 5000000L, -900000L),
      ("c", 1000000L, -2000000L), ("d", 1000000L, -2000000L),
      ("ab", 1000000L, -2500000L), // alt a+b = -1800000: loss < 0
      ("cd", 9000000L, -1200000L), // alt c+d = -4000000: largest loss
      ("ad", 2000000L, -1500000L), // alt a+d = -2900000
      ("cb", 2000000L, -1500000L)) // alt c+b = -2900000: ties "ad"
    val surv = Unigram.pruneByLoss(scored, targetVocab = 0)
      .map(_._1).toSet
    assert(surv.filter(_.length == 1) == Set("a", "b", "c", "d"),
      "singles are never pruned")
    assert(surv.filter(_.length > 1) == Set("cd", "ad", "cb"),
      s"'ab' (negative loss) must be the pruned one: $surv")
    // the target floor overrides the shrink: 4 singles + target 8
    // keeps every multi
    val all = Unigram.pruneByLoss(scored, targetVocab = 8).map(_._1)
    assert(all.count(_.length > 1) == 4)
  }

  test("encode: word counts and segment sums line up") {
    val docs = Seq((1L, "abab ab"), (2L, "abab cd")).toDF("id", "text")
    val rows = Unigram.encode(docs, "id", "text", vocabSize = 3,
        maxPieceLen = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L)._1 === 2L && rows(2L)._1 === 2L)
    assert(rows(1L)._2 >= 2L) // at least one piece per word
    // scores are sums of per-word optima: doc1 repeats words of doc2's
    // first word, so totals are comparable and strictly negative
    assert(rows(1L)._3 < 0L && rows(2L)._3 < 0L)
  }
}
