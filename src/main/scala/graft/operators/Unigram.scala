package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram-LM tokenizer (the SentencePiece unigram family — Kudo
  * 2018, "Subword Regularization"): score candidate word-pieces by
  * corpus log-probability and segment each word with Viterbi over the
  * piece scores. The BPE twin ([[Bpe]]) builds its vocabulary
  * bottom-up by merge; unigram scores a candidate set top-down and
  * lets dynamic programming pick the max-likelihood segmentation —
  * the two families are THE production tokenizer designs, and a
  * pipeline comparing fertility/coverage needs both.
  *
  * This implementation keeps the full pipeline EXACT and
  * oracle-replayable (the [[Bpe]] discipline):
  *
  *  - candidate pieces are all substrings (length ≤ `maxPieceLen`) of
  *    the corpus words, weighted by word frequency; the vocabulary is
  *    the top `vocabSize` by (count, piece) plus every single
  *    character (segmentation closure) — a deterministic frequency
  *    selection rather than the reference EM prune (whose float
  *    likelihood loop is not engine-portable; the SCORING and the
  *    VITERBI — the parts every consumer touches — are the standard
  *    algorithm);
  *  - piece scores are scaled-integer log-probs:
  *    `round(ln(cnt/total)·10⁶)`, computed IN SPARK SQL so the
  *    HALF_UP rounding matches DuckDB's `round` bit-for-bit (Scala's
  *    `Math.round` rounds negative halves the other way);
  *  - Viterbi maximizes the summed score with a min-piece-count tie
  *    break, folded into ONE exact integer objective
  *    `score·1024 − count` (counts ≤ word length < 1024 can never
  *    outvote a 10⁻⁶-of-ln score step), so both engines run the
  *    identical BIGINT DP — no float compare anywhere.
  *
  * Scale shape: training aggregates (piece, count) over DISTINCT
  * words (vocabulary-sized, the [[Bpe.vocab]] observation — the
  * builtin `transform(sequence(...))` substring expansion is fine
  * here because it runs per distinct word, not per document);
  * encoding segments each DISTINCT word once via the codegen'd
  * [[graft.functions.UnigramSegment]] (vocabulary broadcast as
  * expression state, the AhoContains shape) and joins doc words to
  * per-word results — documents shuffle only (word, counts) pairs. */
object Unigram {

  /** (word, n) corpus word frequencies. */
  private def words(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol))))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** The scored piece vocabulary: top `vocabSize` substrings by
    * weighted count (ties by piece text) plus all single characters,
    * with `score = round(ln(cnt/total)·10⁶)` over the FINAL kept
    * set. Output: (piece, cnt, score), one row per piece. */
  def pieceVocab(df: DataFrame, textCol: String, vocabSize: Int = 40,
      maxPieceLen: Int = 4): DataFrame = {
    require(vocabSize >= 1 && maxPieceLen >= 1,
      "vocabSize and maxPieceLen must be >= 1")
    val w = words(df, textCol)
    val subs = flatten(transform(
      sequence(lit(0), length(col("word")) - 1),
      s => filter(
        transform(sequence(lit(1), lit(maxPieceLen)),
          l => when(s + l <= length(col("word")),
            col("word").substr(s + lit(1), l))),
        x => x.isNotNull)))
    val cand = w.select(explode(subs).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
    val top = cand.orderBy(col("cnt").desc, col("piece"))
      .limit(vocabSize)
    val kept = top.unionByName(cand.filter(length(col("piece")) === 1))
      .dropDuplicates("piece")
    val total = kept.agg(sum(col("cnt")).as("__t"))
    kept.crossJoin(total)
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") /
          col("__t").cast("double")) * 1e6, 0).cast("long").as("score"))
  }

  /** Collected (piece, score) arrays behind the session model cache —
    * vocabulary-sized driver metadata, the codebook discipline. */
  def vocabCached(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int): (Array[String], Array[Long]) =
    graft.core.ModelCache.cached(df,
      s"unigram:$textCol:$vocabSize:$maxPieceLen") {
      val rows = pieceVocab(df, textCol, vocabSize, maxPieceLen)
        .orderBy(col("piece")).collect()
      (rows.map(_.getString(0)), rows.map(_.getLong(2)))
    }

  /** One EM refinement iteration over the frequency-selected vocab —
    * the hard-EM (Viterbi re-estimation) variant of Kudo 2018's prune
    * loop, kept integer-exact so the whole step is oracle-replayable:
    *
    *  - E-step: every DISTINCT corpus word takes its CANONICAL optimal
    *    segmentation under the current scores (max objective, ties by
    *    lex-smallest piece array — [[graft.functions.UnigramSegmentPieces]]),
    *    and each piece's usage is the word-frequency-weighted count of
    *    its appearances in those segmentations. Hard assignment in
    *    place of soft expected counts is THE documented deviation:
    *    soft EM's forward-backward posteriors are float sums whose
    *    association order is partition-dependent, so they cannot be
    *    bit-replayed by an independent engine; the hard E-step is pure
    *    integer arithmetic and the canonical tie-break makes the
    *    argmax unique.
    *  - M-step: multi-char pieces with zero usage are PRUNED (the
    *    intent of Kudo's likelihood-loss prune); single characters are
    *    always kept (segmentation closure) with a count floor of 1;
    *    surviving counts re-score as `round(ln(cnt/total)·10⁶)` over
    *    the refined set, in Spark SQL for HALF_UP parity with DuckDB.
    *
    * Scale shape: the E-step segments each DISTINCT word once (the
    * [[encode]] discipline) and shuffles only (piece, usage) pairs —
    * vocabulary-sized; the M-step is a vocab-sized join. Cost is one
    * corpus word-count pass regardless of corpus width.
    *
    * Output: (piece, cnt, score) — the refined vocabulary. */
  def pieceVocabEm(df: DataFrame, textCol: String, vocabSize: Int = 40,
      maxPieceLen: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (pieces, scores) = vocabCached(df, textCol, vocabSize,
      maxPieceLen)
    val init = pieces.toSeq.toDF("piece")
    val usage = words(df, textCol)
      .select(col("n"), explode(graft.functions.UnigramSegmentPieces
        .column(col("word"), pieces, scores, maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("usage"))
    val kept = init.join(usage, Seq("piece"), "left")
      .select(col("piece"),
        coalesce(col("usage"),
          when(length(col("piece")) === 1, lit(1L))).as("cnt"))
      .filter(col("cnt").isNotNull)
    val total = kept.agg(sum(col("cnt")).as("__t"))
    kept.crossJoin(total)
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") /
          col("__t").cast("double")) * 1e6, 0).cast("long").as("score"))
  }

  /** Collected (piece, cnt, total) behind the session model cache —
    * the soft E-step needs raw counts (exact rational probabilities),
    * not log-scores. */
  def vocabCountsCached(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int): (Array[String], Array[Long], Long) =
    graft.core.ModelCache.cached(df,
      s"unigram-cnts:$textCol:$vocabSize:$maxPieceLen") {
      val rows = pieceVocab(df, textCol, vocabSize, maxPieceLen)
        .orderBy(col("piece")).collect()
      (rows.map(_.getString(0)), rows.map(_.getLong(1)),
        rows.map(_.getLong(1)).sum)
    }

  /** One soft E+M step over an explicit (pieces, cnts, total) state —
    * Kudo 2018's actual E-step (forward-backward expected counts over
    * every word's segmentation lattice) in place of [[pieceVocabEm]]'s
    * hard Viterbi assignment, WITHOUT giving up oracle replay. The
    * trick is in [[graft.functions.UnigramExpectedUsage]]: piece
    * probabilities are exact rationals (`cnt / total` — no
    * transcendental enters the lattice), the α/β recursions pin their
    * op order, and each occurrence posterior quantizes to a 1e6-scaled
    * long per word, so the only cross-row arithmetic is exact integer
    * sums (`Σ_w n_w · u_w,piece`) — partition-order-free, replayable
    * by a recursive-CTE oracle running the identical recursions
    * (q224).
    *
    *  - E-step: expected usage per piece =
    *    `Σ_words n · round(Σ_occurrences α·p·β/Z · 10⁶)` — soft credit
    *    to EVERY segmentation, weighted by its probability;
    *  - M-step: multi-char pieces with zero expected usage prune;
    *    single characters always survive with the scaled-unit floor
    *    `max(usage, 10⁶)` (segmentation closure, the hard-EM floor
    *    carried to the scaled domain); survivors re-score as
    *    `round(ln(cnt_s/total_s)·10⁶)` in Spark SQL (HALF_UP parity).
    *
    * Scale shape identical to [[pieceVocabEm]]: one pass over DISTINCT
    * words, vocabulary-sized shuffles only. Output: (piece, cnt,
    * score) with `cnt` the 1e6-SCALED expected usage. [[trainSoftEm]]
    * is the ONE public entry point — `iters = 1, prune = false` runs
    * exactly this step once. */
  private def emStep(df: DataFrame, textCol: String,
      pieces: Array[String], cnts: Array[Long], total: Long,
      maxPieceLen: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val init = pieces.toSeq.toDF("piece")
    val usage = words(df, textCol)
      .select(col("n"), explode(graft.functions.UnigramExpectedUsage
        .column(col("word"), pieces, cnts, total, maxPieceLen))
        .as("pu"))
      .groupBy(col("pu.piece").as("piece"))
      .agg(sum(col("n") * col("pu.u")).as("usage_s"))
    val kept = init.join(usage, Seq("piece"), "left")
      .select(col("piece"),
        when(length(col("piece")) === 1,
          greatest(coalesce(col("usage_s"), lit(0L)), lit(1000000L)))
          .otherwise(col("usage_s")).as("cnt"))
      .filter(col("cnt").isNotNull && col("cnt") > 0)
    val totalS = kept.agg(sum(col("cnt")).as("__t"))
    kept.crossJoin(totalS)
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") /
          col("__t").cast("double")) * 1e6, 0).cast("long").as("score"))
  }

  /** Codepoint-indexed substring/length — DuckDB `substr`/`len`
    * semantics (and [[graft.functions.UnigramSegment.segment]]'s
    * rationale): the driver-side prune must slice pieces exactly the
    * way the oracle does, or a surrogate-pair piece would rank under
    * a different loss. */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)
  private def cpSubstr(s: String, start: Int, len: Int): String = {
    val a = s.offsetByCodePoints(0, start)
    val b = s.offsetByCodePoints(a, len)
    s.substring(a, b)
  }

  /** All compositions of `n` into ≥ 2 ordered positive parts — the
    * proper segmentations of an n-codepoint piece into strictly
    * smaller pieces (a part can never equal the whole, so the piece
    * itself is excluded by construction). Bounded: n ≤ maxPieceLen ≤
    * a handful, so the enumeration is a few dozen rows at most. */
  private[graft] def properCompositions(n: Int): Seq[Seq[Int]] = {
    def comps(m: Int): Seq[Seq[Int]] =
      if (m == 0) Seq(Seq.empty)
      else (1 to m).flatMap(l => comps(m - l).map(l +: _))
    comps(n).filter(_.size >= 2)
  }

  /** The best alternative segmentation score of `piece` using OTHER
    * kept pieces: max over proper compositions of the summed integer
    * scores (None when some composition part is missing from the kept
    * set AND no all-singles fallback exists — can't happen while
    * single characters are always kept, but a missing alternative
    * ranks the piece unprunable rather than crashing). */
  private def altScore(piece: String, score: Map[String, Long])
      : Option[Long] = {
    val n = cpLen(piece)
    val sums = properCompositions(n).flatMap { parts =>
      val bounds = parts.scanLeft(0)(_ + _)
      val segs = bounds.zip(parts).map { case (off, l) =>
        cpSubstr(piece, off, l)
      }
      if (segs.forall(score.contains)) Some(segs.map(score).sum)
      else None
    }
    sums.reduceOption(_ max _)
  }

  /** Kudo 2018's prune step on a scored vocabulary: rank multi-char
    * pieces by the first-order likelihood LOSS of removing them —
    * `expected_usage × (score − best_alternative_score)`, i.e. how
    * much corpus log-probability is paid to re-segment the piece's
    * occurrences through other pieces (SentencePiece's loss, with the
    * alternative evaluated over proper compositions of the piece) —
    * and keep the top `max(targetVocab − |singles|, ceil(3·n/4))`
    * (the 0.75 shrink factor, floored at the target). Single
    * characters always survive (segmentation closure). Everything is
    * exact integer arithmetic (BigInt products, integer ceil-div,
    * (loss DESC, piece ASC) ranking), so a recursive-CTE oracle
    * replays the ranking bit for bit. */
  private[graft] def pruneByLoss(
      scored: Array[(String, Long, Long)], targetVocab: Int)
      : Array[(String, Long)] = {
    val score = scored.map(r => r._1 -> r._3).toMap
    val (singles, multis) = scored.partition(r => cpLen(r._1) == 1)
    val nM = multis.length
    val targetMulti = math.max(0, targetVocab - singles.length)
    val keepM = math.min(nM, math.max(targetMulti, (3 * nM + 3) / 4))
    val ranked = multis.map { case (p, c, s) =>
      (p, c, altScore(p, score).map(a => BigInt(c) * BigInt(s - a)))
    }
    def before(a: (String, Long, Option[BigInt]),
        b: (String, Long, Option[BigInt])): Boolean = (a._3, b._3) match {
      case (None, None) => a._1 < b._1 // unsplittable: infinite loss
      case (None, _) => true
      case (_, None) => false
      case (Some(x), Some(y)) => if (x != y) x > y else a._1 < b._1
    }
    (singles.map(r => (r._1, r._2)) ++
      ranked.sortWith(before).take(keepM).map(r => (r._1, r._2)))
      .sortBy(_._1)
  }

  /** The soft-EM TRAINING LOOP — Kudo 2018's actual algorithm on top
    * of the single refinement step: alternate the forward-backward
    * E-step + M-step rescore ([[emStep]]) with [[pruneByLoss]]
    * until `iters` rounds ran,
    * shrinking the multi-char vocabulary 25 % per round but never
    * below `targetVocab`. The next round's piece probabilities are
    * the surviving expected usages renormalized over the survivors —
    * exact rationals again, so every round's lattice stays
    * oracle-replayable (q227 unrolls two full rounds in recursive
    * CTEs).
    *
    * Scale shape: each round is ONE distributed pass over DISTINCT
    * corpus words (vocabulary-sized shuffles only — the [[encode]]
    * discipline) plus driver work on the ≤ vocab-sized scored rows
    * (the codebook discipline); `iters` is a small constant, so cost
    * is `iters` corpus word passes regardless of corpus width.
    * Output: (piece, cnt, score) over the final vocabulary, scores
    * re-normalized over the survivors in Spark SQL.
    *
    * Knobs: `iters` rounds of E+M; `prune = false` skips the loss
    * ranking (every surviving piece carries into the next round; the
    * M-step's zero-usage drop still applies) — `iters = 1, prune =
    * false` is the single-refinement mode (q224), returned as the
    * step's own LAZY frame with no driver collect at all. */
  def trainSoftEm(df: DataFrame, textCol: String, vocabSize: Int = 40,
      maxPieceLen: Int = 4, iters: Int = 2, targetVocab: Int = 20,
      prune: Boolean = true): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(targetVocab >= 0, "targetVocab must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    var (pieces, cnts, total) = vocabCountsCached(df, textCol,
      vocabSize, maxPieceLen)
    var i = 0
    while (i < iters) {
      val step = emStep(df, textCol, pieces, cnts, total, maxPieceLen)
      // unpruned final round: the step's own M-step rescore IS the
      // result — hand back the lazy frame (zero collects, the exact
      // plan the retired pieceVocabEmSoft entry point built)
      if (!prune && i == iters - 1) return step
      val scored = step.orderBy(col("piece")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val surv =
        if (prune) pruneByLoss(scored, targetVocab)
        else scored.map(r => (r._1, r._2))
      pieces = surv.map(_._1)
      cnts = surv.map(_._2)
      total = cnts.sum
      i += 1
    }
    // final scores renormalize over the pruned set — ln/round in
    // Spark SQL for HALF_UP parity with the oracle
    val out = pieces.zip(cnts).toSeq.toDF("piece", "cnt")
    val t = out.agg(sum(col("cnt")).as("__t"))
    out.crossJoin(t)
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") /
          col("__t").cast("double")) * 1e6, 0).cast("long").as("score"))
      .orderBy(col("piece"))
  }

  /** Per-document encoding summary under a freshly trained vocab:
    * (idCol, n_words, n_pieces, score_s) where `n_pieces` sums each
    * word's optimal piece count and `score_s` the scaled-integer
    * Viterbi log-prob. Each DISTINCT word segments once; unknown
    * characters (never in corpus-encode) cost the documented UNK
    * penalty. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 40, maxPieceLen: Int = 4): DataFrame = {
    val (pieces, scores) = vocabCached(df, textCol, vocabSize,
      maxPieceLen)
    val perWord = words(df, textCol).select(col("word"))
      .withColumn("__v", graft.functions.UnigramSegment.column(
        col("word"), pieces, scores, maxPieceLen))
      .withColumn("__nv", -col("__v"))
      .select(col("word"),
        pmod(col("__nv"), lit(1024L)).as("__c"),
        (-((col("__nv") - pmod(col("__nv"), lit(1024L))) /
          lit(1024L)).cast("long")).as("__s"))
    df.select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .join(perWord, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__c")).as("n_pieces"),
        sum(col("__s")).as("score_s"))
  }
}
