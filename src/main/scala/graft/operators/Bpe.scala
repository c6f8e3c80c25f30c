package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Byte-pair-encoding merge training (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the standard subword-tokenizer induction step of an LLM data
  * pipeline, upgraded here from the repo's regex token-count proxy
  * ([[TextFunctions.bpeishCount]]) to the real merge-learning loop.
  *
  * Scale shape (the textbook trick, and the reason BPE training is
  * feasible on a 100 TB corpus at all): the corpus is reduced ONCE to
  * the weighted word vocabulary — (distinct word, occurrence count) —
  * and every merge iteration runs over that vocab table, whose size
  * is corpus-size-independent. Per iteration: adjacent symbol pairs
  * are formed in-row, one map-side-combined aggregate produces the
  * weighted pair counts, and the argmax pair (count desc, pair asc —
  * deterministic) is a 1-row bounded collect (model metadata, like
  * the k-means codebook). The merge is applied in-row via a
  * boundary-spaced string replace.
  *
  * Symbol sequences are represented as strings with every symbol
  * wrapped in its OWN pair of spaces (` b  a  t  </w> ` — double
  * space between symbols), so each adjacent-pair occurrence carries
  * its own boundary characters and a single left-to-right
  * non-overlapping `replace(sym, ' l  r ', ' lr ')` is exactly BPE's
  * greedy leftmost merge even through runs of a repeated symbol
  * (`a a a a` → `(aa)(aa)`; a single-space representation would share
  * the middle boundary and stall after the first merge). Plain-string
  * replace has identical scan semantics in Java and DuckDB, so the
  * oracle unrolls the training loop in SQL with the same replace.
  */
object Bpe {

  /** Weighted word vocabulary with initial symbolization:
    * (word, n, sym) where sym = ' c1  c2  …  </w> '. */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol))))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .withColumn("sym", concat(lit(" "),
        regexp_replace(col("word"), "(.)", "$1  "), lit("</w> ")))

  /** Weighted adjacent-pair counts over the current vocab. Words
    * already reduced to one symbol are skipped (a descending
    * `sequence(0, -1)` would otherwise index element 0). */
  def pairCounts(v: DataFrame): DataFrame = {
    val withSyms = v.withColumn("__sy", split(trim(col("sym")), " +"))
      .filter(size(col("__sy")) >= 2)
    withSyms.select(col("n"), explode(transform(
        sequence(lit(0), size(col("__sy")) - 2),
        i => struct(element_at(col("__sy"), i + 1).as("l"),
          element_at(col("__sy"), i + 2).as("r")))).as("__p"))
      .groupBy(col("__p.l").as("left"), col("__p.r").as("right"))
      .agg(sum(col("n")).as("cnt"))
  }

  /** One learned merge: (step, left, right, pair_count). */
  case class Merge(step: Int, left: String, right: String, cnt: Long)

  /** Train `merges` BPE merges; returns them in learning order plus
    * the post-merge vocab (word, n, sym) for the encode path.
    * Single-symbol vocab (no pairs left) stops early.
    *
    * Lineage stays BOUNDED at any merge budget: each merge stacks one
    * `regexp_replace` on the vocab plan, so every `rematerializeEvery`
    * merges the merged vocab is re-written to scratch and the chain
    * restarts from a plain scan — without this, iteration *i* re-runs
    * all *i−1* prior replaces and a 32k-merge production vocab would
    * carry a 32k-deep plan. Superseded scratch generations are dropped
    * eagerly, so peak scratch is two vocab copies. */
  def trainWithVocab(df: DataFrame, textCol: String, merges: Int,
      rematerializeEvery: Int = 16): (Seq[Merge], DataFrame) = {
    require(rematerializeEvery >= 1, "rematerializeEvery must be >= 1")
    // materialize the vocab ONCE: every merge iteration (and the encode
    // join) would otherwise re-execute the corpus scan + groupBy through
    // lazy lineage — the exact cost the vocab reduction exists to avoid
    var (v, vPath) = graft.core.Scratch.materializeWithPath(
      vocab(df, textCol), "bpe_vocab")
    val spark = df.sparkSession
    val out = Seq.newBuilder[Merge]
    var step = 1
    var sinceMat = 0
    var done = false
    while (step <= merges && !done) {
      val top = pairCounts(v)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect() // bounded: 1 row of model metadata
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        out += Merge(step, l, r, c)
        v = v.withColumn("sym",
          regexp_replace(col("sym"),
            java.util.regex.Pattern.quote(s" $l  $r "),
            java.util.regex.Matcher.quoteReplacement(s" $l$r ")))
        sinceMat += 1
        if (sinceMat >= rematerializeEvery && step < merges) {
          val (nv, np) = graft.core.Scratch.materializeWithPath(
            v, s"bpe_vocab_$step")
          graft.core.Scratch.drop(spark, vPath)
          v = nv; vPath = np; sinceMat = 0
        }
        step += 1
      }
    }
    (out.result(), v)
  }

  /** Train `merges` BPE merges; returns them in learning order. */
  def train(df: DataFrame, textCol: String, merges: Int): Seq[Merge] =
    trainWithVocab(df, textCol, merges)._1

  /** [[trainWithVocab]] behind the session model cache
    * ([[graft.core.ModelCache]] — train-once-reuse, keyed on the
    * canonicalized input plan): first call trains and materializes
    * the post-merge vocab; subsequent calls with the same (input
    * plan, textCol, merges) reuse the scratch copy. The cached value
    * is bounded model metadata: the merge list plus the vocab's
    * scratch PATH (corpus-size-independent by the vocab reduction). */
  def trainWithVocabCached(df: DataFrame, textCol: String,
      merges: Int): (Seq[Merge], DataFrame) = {
    val (ms, path) = graft.core.ModelCache.cached(
      df, s"bpe:$textCol:$merges") {
      val (m, v) = trainWithVocab(df, textCol, merges)
      val (_, p) =
        graft.core.Scratch.materializeWithPath(v, "bpe_vocab_final")
      (m, p)
    }
    (ms, df.sparkSession.read.parquet(path))
  }

  /** The learned merge list as a DataFrame (query/oracle surface). */
  def mergesDF(spark: SparkSession, df: DataFrame, textCol: String,
      merges: Int): DataFrame = {
    import spark.implicits._
    trainWithVocabCached(df, textCol, merges)._1
      .toDF("step", "lhs", "rhs", "pair_count")
  }

  /** Encode the corpus with a freshly trained merge table: per-doc
    * BPE token count, word count, and chars-per-token compression.
    *
    * Scale shape: encoding is a word→vocab equi-join — the corpus
    * text itself is never re-scanned per merge (all merge applications
    * happen on the corpus-size-independent vocab table), and the vocab
    * side of the join is small enough to broadcast in practice. Docs
    * with no tokens survive with zero counts (left join + coalesce).
    */
  /** (word, __nsym) — per-word BPE token count under a trained vocab;
    * the broadcast-able side of the encode/count joins. */
  def perWordCounts(v: DataFrame): DataFrame =
    v.select(col("word"),
      size(split(trim(col("sym")), " +")).cast("long").as("__nsym"))

  /** Compare by Unicode code point — identical to UTF-8 binary byte
    * order (UTF-8 preserves code-point order), which is what DuckDB's
    * default binary collation sorts by. Java's `String.compareTo` is
    * UTF-16 code-UNIT order, which diverges when supplementary-plane
    * characters meet BMP chars in U+E000..U+FFFF (surrogates sort
    * below them), so it would assign different ids than the oracle on
    * such corpora. */
  private[operators] def codePointCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** The trained tokenizer's symbol→id table, collected to the driver:
    * distinct symbols of the post-merge vocab, ids assigned in UTF-8
    * binary order (matching DuckDB/ICU-binary `ORDER BY`, so the
    * oracle re-derives identical ids). BOUNDED model metadata — at
    * most |character set| + merges entries (each merge mints exactly
    * one new symbol), independent of corpus size; the same class of
    * driver-held artifact as the k-means codebook or the merge table
    * itself. */
  def symbolIds(v: DataFrame): Map[String, Int] =
    v.select(explode(split(trim(col("sym")), " +")).as("s"))
      .distinct().collect().map(_.getString(0))
      .sortWith(codePointCompare(_, _) < 0).zipWithIndex.toMap

  /** REAL tokenization: encode every document to its BPE token-id
    * sequence — (id, token_ids array<int>, n_bpe_tokens), the artifact
    * a training export actually ships.
    *
    * Scale shape: all merge applications ran on the corpus-size-
    * independent vocab table ([[trainWithVocab]]); encoding is then a
    * word→vocab equi-join with the vocab side BROADCAST (the weighted
    * word list is ~10⁷ rows by Heaps' law on a 100 TB corpus — ~100 MB,
    * executor-resident), so the only exchange is the per-document
    * reassembly groupBy carrying (id, pos, array<int>) rows: token ids,
    * never text. Per-word symbol→id mapping is an in-row map-literal
    * lookup. Documents with no tokens encode to the empty sequence.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame = {
    val (_, v) = trainWithVocabCached(df, textCol, merges)
    val symMap = typedLit(symbolIds(v))
    val perWord = v.select(col("word"),
      transform(split(trim(col("sym")), " +"),
        s => element_at(symMap, s)).as("__ids"))
    val words = df.select(col(idCol),
      posexplode_outer(TextFunctions.tokens(lower(col(textCol))))
        .as(Seq("__pos", "word")))
    // sort by in-doc position, drop the null row token-less docs emit
    // through posexplode_outer, then splice the per-word id runs
    val packed = words.join(broadcast(perWord), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(flatten(transform(
        filter(array_sort(collect_list(
            struct(col("__pos").as("p"), col("__ids").as("ids")))),
          x => x.getField("ids").isNotNull),
        x => x.getField("ids"))).as("token_ids"))
    packed.select(col(idCol), col("token_ids"),
      size(col("token_ids")).cast("long").as("n_bpe_tokens"))
  }

  /** Per-document BPE token count under a freshly trained `merges`-step
    * vocab: (id, n_tokens) — the length column sequence packing
    * ([[Chunking.packCounts]]) consumes. Broadcast word→vocab join +
    * one map-side-combined sum; token-less docs count 0. */
  def encodeCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame = {
    val (_, v) = trainWithVocabCached(df, textCol, merges)
    df.select(col(idCol),
        explode_outer(TextFunctions.tokens(lower(col(textCol))))
          .as("word"))
      .join(broadcast(perWordCounts(v)), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("__nsym")), lit(0L)).as("n_tokens"))
  }

  def encodeStats(df: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame = {
    val (_, v) = trainWithVocabCached(df, textCol, merges)
    val perWord = perWordCounts(v)
    // single corpus scan: n_chars rides along the explode (explode_outer
    // keeps token-less docs as a null word the left join passes through)
    val words = df.select(col(idCol),
      length(col(textCol)).cast("long").as("__nc"),
      explode_outer(TextFunctions.tokens(lower(col(textCol))))
        .as("word"))
    words.join(perWord, Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("__nsym")), lit(0L)).as("n_bpe_tokens"),
        count(col("word")).as("n_words"),
        first(col("__nc")).as("__nc"))
      .select(col(idCol), col("n_bpe_tokens"), col("n_words"),
        graft.functions.Rounding.dround(col("__nc") /
          greatest(col("n_bpe_tokens"), lit(1L)).cast("double"), 4)
          .as("chars_per_token"))
  }
}
