package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document chunking and sequence packing — the two layout steps between
  * a curated corpus and a training run.
  *
  * Both are narrow, deterministic transforms: chunking is a per-row
  * explode (no shuffle at all); packing is one window shuffle per shard
  * with the shard count chosen by the caller — there is deliberately no
  * global ordering anywhere (a single global cumsum would serialize the
  * corpus through one task at 100 TB; per-shard packing is how training
  * pipelines actually shard).
  */
object Chunking {

  /** Split each document into fixed-size overlapping token windows.
    * A document with `n` tokens yields chunks starting at 0, step,
    * 2·step, … (< n) where `step = chunkSize - overlap`; the last chunk
    * may be short. Empty documents yield no chunks.
    *
    * Output: (`idCol`, chunk_idx, chunk_text, n_chunk_tokens) — one row
    * per chunk, via posexplode over the start offsets (narrow map).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      "need chunkSize > overlap >= 0")
    val step = chunkSize - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    val starts = when(n > 0,
      sequence(lit(0), n - 1, lit(step))).otherwise(
      array().cast("array<int>"))
    docs.select(col(idCol), toks.as("__toks"), starts.as("__starts"))
      .select(col(idCol), col("__toks"),
        posexplode(col("__starts")).as(Seq("chunk_idx", "__start")))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("__start") + 1,
          lit(chunkSize))).as("chunk_text"),
        size(slice(col("__toks"), col("__start") + 1, lit(chunkSize)))
          .as("n_chunk_tokens"))
  }

  /** Greedy contiguous sequence packing: within each shard, documents
    * (in `orderCol` order) are laid head-to-tail into a virtual token
    * stream that is cut every `budget` tokens — exactly the
    * concat-then-cut packing used to fill fixed-length training
    * sequences. Emits, per document: its shard, the pack it starts in
    * (`floor(offset / budget)`), its offset within that pack, and
    * whether it straddles a pack boundary.
    *
    * `shards` bounds parallelism AND window state: the cumulative sum
    * runs per shard (hash of the doc id), never globally — each shard's
    * packing is independent, which is what makes this linear at 100 TB.
    * Pack ids are globally unique: `shard * 2^40 + pack_in_shard`.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int): DataFrame =
    packCounts(docs.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).cast("long")
        .as("n_tokens")), idCol, budget, shards)

  /** [[packSequences]] over a precomputed `n_tokens` column — the form
    * a composed pipeline uses so document text never reaches the
    * packing exchange (only (id, n_tokens) rows shuffle). */
  def packCounts(docs: DataFrame, idCol: String,
      budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    // shard = id mod shards must be integral arithmetic: a string id
    // would cast to null and collapse every row into one window
    // partition — a single global cumsum through one task
    require({
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(docs.schema(idCol).dataType)
    }, s"packSequences needs an integral id column, got " +
      s"${docs.schema(idCol).dataType.simpleString}")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs.select(col(idCol), col("n_tokens"),
      pmod(col(idCol), lit(shards)).cast("int").as("shard"))
      .withColumn("stream_offset",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id",
        col("shard").cast("long") * lit(1L << 40) +
          floor(col("stream_offset") / budget).cast("long"))
      .withColumn("offset_in_pack", col("stream_offset") % budget)
      .withColumn("spans_boundary",
        (col("stream_offset") % budget) + col("n_tokens") > budget)
  }
}
