package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Per-group Bloom filter over BIGINT keys — the membership sibling of
  * [[CmsState]] (frequency) and the file-skipping complement of the
  * min/max stats manifest: min/max prunes RANGE predicates, a Bloom
  * bitset prunes EQUALITY predicates on high-cardinality keys where
  * the [min, max] envelope of every file spans the whole domain (e.g.
  * a uniformly distributed id: no file's range excludes anything, yet
  * each file holds only its own keys).
  *
  * Hashing is splitmix64 double-hashing — `(h1 + i·h2) mod numBits`,
  * `h2` forced odd — the same seedless, pure-JVM scheme as the
  * count-min sketch: deterministic across sessions and independent of
  * any SQL-level hash, so a DRIVER-side probe ([[BloomState
  * .mightContainSerialized]]) needs no Spark expression replay. Like
  * [[graft.operators.BloomJoin]], keys must already be integral —
  * hash strings to BIGINT explicitly at build AND probe time, never
  * implicitly (a silent cast would insert one representation and
  * probe another, breaking the no-false-negative contract).
  *
  * No false negatives ever; false-positive rate ≈ (1 - e^(-kn/m))^k
  * for n keys, m bits, k hashes — size `numBits` for the file's
  * expected row count (the default 1 MiB of bits per file holds 1M
  * rows at ~2% fp with k=6).
  */
final class BloomState(val numBits: Int, val numHashes: Int) {
  require(numBits >= 64, s"bloom needs >= 64 bits, got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"1..16 hashes, got $numHashes")
  val words = new Array[Long]((numBits + 63) / 64)
  var count = 0L

  def add(key: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val bit = BloomState.slot(key, i, numBits)
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
    count += 1L
  }

  def mightContain(key: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val bit = BloomState.slot(key, i, numBits)
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def merge(other: BloomState): Unit = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"bloom shape mismatch: $numBits/$numHashes vs " +
        s"${other.numBits}/${other.numHashes}")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    count += other.count
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + words.length * 8)
    bb.putInt(numBits).putInt(numHashes).putLong(count)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

object BloomState {

  /** Hash-i bit index for a key (double hashing, h2 forced odd). */
  @inline def slot(key: Long, i: Int, numBits: Int): Int = {
    val h1 = CmsState.splitmix64(key)
    val h2 = CmsState.splitmix64(key ^ 0x9e3779b97f4a7c15L) | 1L
    (((h1 + i.toLong * h2) & Long.MaxValue) % numBits).toInt
  }

  def deserialize(bytes: Array[Byte]): BloomState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new BloomState(bb.getInt, bb.getInt)
    st.count = bb.getLong
    var i = 0
    while (i < st.words.length) { st.words(i) = bb.getLong; i += 1 }
    st
  }

  /** Probe straight off the serialized form — reads the header and the
    * `numHashes` addressed words in place, no copy. This is the
    * DRIVER-side file-skipping test: the manifest is files-sized
    * metadata, so probing it never touches executors. */
  def mightContainSerialized(bytes: Array[Byte], key: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes)
    val numBits = bb.getInt(0); val numHashes = bb.getInt(4)
    var i = 0
    while (i < numHashes) {
      val bit = slot(key, i, numBits)
      if ((bb.getLong(16 + (bit >>> 6) * 8) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  def countSerialized(bytes: Array[Byte]): Long =
    ByteBuffer.wrap(bytes).getLong(8)

  /** Aggregate a BIGINT key column into a serialized Bloom bitset. */
  def agg(key: Column, numBits: Int = 1 << 20, numHashes: Int = 6)
      : Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(key), numBits, numHashes)
        .toAggregateExpression())
}

/** Aggregate: build a Bloom bitset from raw BIGINT keys (nulls are
  * skipped — a NULL never matches an equality probe). */
case class BloomAgg(
    key: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomState] {

  override def children: Seq[Expression] = Seq(key)
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a BIGINT key, got ${key.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomState =
    new BloomState(numBits, numHashes)
  override def update(buf: BloomState, input: InternalRow): BloomState = {
    val k = key.eval(input)
    if (k != null) buf.add(k.asInstanceOf[Long])
    buf
  }
  override def merge(buf: BloomState, other: BloomState): BloomState = {
    buf.merge(other); buf
  }
  override def eval(buf: BloomState): Any = buf.serialize()
  override def serialize(buf: BloomState): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): BloomState =
    BloomState.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomAgg = copy(key = c(0))
  override def prettyName: String = "bloom_agg"
}
