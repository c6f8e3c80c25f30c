package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Count-min sketch over BIGINT keys: `depth × width` counters, key
  * hashed `depth` ways by splitmix64 double-hashing (pure JVM wrapping
  * arithmetic — deterministic, seedless, engine-independent of any
  * SQL-level hash). Point estimate = min over the depth counters:
  * always an OVERcount (no deletions), within `e/width · N` of exact
  * with probability `1 - exp(-depth)`.
  *
  * This is the mergeable-frequency-sketch sibling of the HLL rollup
  * (q75): persist per-partition sketches once; any coarser rollup
  * merges `depth·width` longs per partition instead of rescanning raw
  * rows. Memory is O(depth·width) per group regardless of input size,
  * and partials combine map-side like any TypedImperativeAggregate.
  */
final class CmsState(val depth: Int, val width: Int) {
  val counts = new Array[Long](depth * width)
  var total = 0L

  def add(key: Long): Unit = {
    var i = 0
    while (i < depth) {
      counts(i * width + CmsState.slot(key, i, width)) += 1L
      i += 1
    }
    total += 1L
  }

  def estimate(key: Long): Long = {
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counts(i * width + CmsState.slot(key, i, width))
      if (c < min) min = c
      i += 1
    }
    min
  }

  def merge(other: CmsState): Unit = {
    require(other.depth == depth && other.width == width,
      s"sketch shape mismatch: ${depth}x$width vs " +
        s"${other.depth}x${other.width}")
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    total += other.total
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + counts.length * 8)
    bb.putInt(depth).putInt(width).putLong(total)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.array()
  }
}

object CmsState {

  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Row-i slot for a key: (h1 + i·h2) double hashing, h2 forced odd. */
  @inline def slot(key: Long, i: Int, width: Int): Int = {
    val h1 = splitmix64(key)
    val h2 = splitmix64(key ^ 0x2545f4914f6cdd1dL) | 1L
    (((h1 + i.toLong * h2) & Long.MaxValue) % width).toInt
  }

  def deserialize(bytes: Array[Byte]): CmsState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new CmsState(bb.getInt, bb.getInt)
    st.total = bb.getLong
    var i = 0
    while (i < st.counts.length) { st.counts(i) = bb.getLong; i += 1 }
    st
  }

  /** Point estimate straight off the serialized form — reads only the
    * header and the `depth` addressed counters, no full copy. */
  def estimateSerialized(bytes: Array[Byte], key: Long): Long = {
    val bb = ByteBuffer.wrap(bytes)
    val depth = bb.getInt(0); val width = bb.getInt(4)
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = bb.getLong(16 + (i * width + slot(key, i, width)) * 8)
      if (c < min) min = c
      i += 1
    }
    min
  }

  def totalSerialized(bytes: Array[Byte]): Long =
    ByteBuffer.wrap(bytes).getLong(8)
}

/** Aggregate: build a sketch from raw BIGINT keys. */
case class CountMinAgg(
    key: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  require(depth >= 1 && width >= 2, s"bad sketch shape ${depth}x$width")

  override def children: Seq[Expression] = Seq(key)
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min expects a BIGINT key, got ${key.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CmsState =
    new CmsState(depth, width)
  override def update(buf: CmsState, input: InternalRow): CmsState = {
    val k = key.eval(input)
    if (k != null) buf.add(k.asInstanceOf[Long])
    buf
  }
  override def merge(buf: CmsState, other: CmsState): CmsState = {
    buf.merge(other); buf
  }
  override def eval(buf: CmsState): Any = buf.serialize()
  override def serialize(buf: CmsState): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): CmsState =
    CmsState.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CountMinAgg = copy(key = c(0))
  override def prettyName: String = "count_min"
}

/** Aggregate: union already-serialized sketches (the rollup step). */
case class CmsMergeAgg(
    sketch: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsState] {

  override def children: Seq[Expression] = Seq(sketch)
  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_merge expects BINARY, got ${sketch.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // the empty buffer has no shape yet — adopt the first sketch's
  override def createAggregationBuffer(): CmsState = new CmsState(1, 2)
  private def absorb(buf: CmsState, st: CmsState): CmsState =
    if (buf.total == 0L && buf.depth == 1 && buf.width == 2) st
    else { buf.merge(st); buf }
  override def update(buf: CmsState, input: InternalRow): CmsState = {
    val b = sketch.eval(input)
    if (b == null) buf
    else absorb(buf, CmsState.deserialize(b.asInstanceOf[Array[Byte]]))
  }
  override def merge(buf: CmsState, other: CmsState): CmsState =
    if (other.total == 0L && other.depth == 1 && other.width == 2) buf
    else absorb(buf, other)
  override def eval(buf: CmsState): Any = buf.serialize()
  override def serialize(buf: CmsState): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): CmsState =
    CmsState.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CmsMergeAgg = copy(sketch = c(0))
  override def prettyName: String = "cms_merge"
}

/** Scalar: point-estimate a key against a serialized sketch. Reads the
  * `depth` addressed counters in place (no deserialization copy), so
  * it is safe to call per row; codegen'd via a static helper like the
  * other native expressions. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cms_estimate expects (BINARY sketch, BIGINT key), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CmsState.estimateSerialized(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = CmsState.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      (s, k) => s"${ev.value} = $cls.estimateSerialized($s, $k);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}

/** Scalar: the total item count folded into a sketch (header read). */
case class CmsTotal(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_total expects BINARY, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any): Any =
    CmsState.totalSerialized(sketch.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = CmsState.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = $cls.totalSerialized($s);")
  }

  override protected def withNewChildInternal(c: Expression): CmsTotal =
    copy(child = c)
  override def prettyName: String = "cms_total"
}

object CountMin {
  def agg(key: Column, depth: Int = 5, width: Int = 1024): Column =
    GraftBridge.column(CountMinAgg(GraftBridge.expression(key),
      depth, width).toAggregateExpression())

  def mergeAgg(sketch: Column): Column =
    GraftBridge.column(CmsMergeAgg(GraftBridge.expression(sketch))
      .toAggregateExpression())

  def estimate(sketch: Column, key: Column): Column =
    GraftBridge.column(CmsEstimate(GraftBridge.expression(sketch),
      GraftBridge.expression(key)))

  def total(sketch: Column): Column =
    GraftBridge.column(CmsTotal(GraftBridge.expression(sketch)))
}
