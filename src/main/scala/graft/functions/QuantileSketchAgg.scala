package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.types._

/** Mergeable quantile sketch (Greenwald-Khanna summaries — the same
  * structure behind Spark's `approx_percentile`, here exposed as a
  * PERSISTABLE binary so rollups re-aggregate sketches instead of raw
  * rows). Completes the mergeable-sketch family: HLL for distincts
  * (q75), count-min for frequencies (q89), GK for quantiles.
  *
  * Rank guarantee: a query at fraction p returns a value whose true
  * rank is within `relativeError · n` of p·n; merging two summaries
  * preserves the bound (conservatively: consumers should allow 2ε
  * after deep merge trees).
  */
final class QSketchState(var qs: QuantileSummaries) {
  def insert(v: Double): Unit = qs = qs.insert(v)
  def compress(): Unit = qs = qs.compress()
  def merge(other: QSketchState): Unit = {
    compress(); other.compress()
    qs = if (other.qs.count == 0L) qs
    else if (qs.count == 0L) other.qs
    else qs.merge(other.qs)
  }
}

object QSketchState {
  def empty(relativeError: Double): QSketchState =
    new QSketchState(new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError))

  def serialize(st: QSketchState): Array[Byte] = {
    st.compress()
    val s = st.qs.sampled
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + s.length * 24)
    bb.putInt(st.qs.compressThreshold).putDouble(st.qs.relativeError)
      .putLong(st.qs.count).putInt(s.length)
    s.foreach { t =>
      bb.putDouble(t.value).putLong(t.g).putLong(t.delta)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): QSketchState = {
    val bb = ByteBuffer.wrap(bytes)
    val ct = bb.getInt; val re = bb.getDouble
    val count = bb.getLong; val n = bb.getInt
    val stats = Array.fill(n)(Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QSketchState(
      new QuantileSummaries(ct, re, stats, count, true))
  }

  /** Quantile query off the serialized form; NaN when empty (keeps the
    * expression non-nullable and total). */
  def querySerialized(bytes: Array[Byte], p: Double): Double =
    deserialize(bytes).qs.query(p).getOrElse(Double.NaN)
}

/** Aggregate: build a quantile sketch from raw DOUBLE values. */
case class QuantileSketchAgg(
    child: Expression, relativeError: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchState] {

  require(relativeError > 0 && relativeError < 0.5,
    s"relativeError must be in (0, 0.5), got $relativeError")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch expects DOUBLE, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QSketchState =
    QSketchState.empty(relativeError)
  override def update(buf: QSketchState, input: InternalRow)
      : QSketchState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }
  override def merge(buf: QSketchState, other: QSketchState)
      : QSketchState = { buf.merge(other); buf }
  override def eval(buf: QSketchState): Any = QSketchState.serialize(buf)
  override def serialize(buf: QSketchState): Array[Byte] =
    QSketchState.serialize(buf)
  override def deserialize(b: Array[Byte]): QSketchState =
    QSketchState.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketchAgg = copy(child = c(0))
  override def prettyName: String = "quantile_sketch"
}

/** Aggregate: union already-serialized quantile sketches. */
case class QuantileSketchMergeAgg(
    sketch: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchState] {

  override def children: Seq[Expression] = Seq(sketch)
  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch_merge expects BINARY, got " +
        sketch.dataType.simpleString)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QSketchState =
    QSketchState.empty(QuantileSummaries.defaultRelativeError)
  override def update(buf: QSketchState, input: InternalRow)
      : QSketchState = {
    val b = sketch.eval(input)
    if (b == null) buf
    else {
      buf.merge(QSketchState.deserialize(b.asInstanceOf[Array[Byte]]))
      buf
    }
  }
  override def merge(buf: QSketchState, other: QSketchState)
      : QSketchState = { buf.merge(other); buf }
  override def eval(buf: QSketchState): Any = QSketchState.serialize(buf)
  override def serialize(buf: QSketchState): Array[Byte] =
    QSketchState.serialize(buf)
  override def deserialize(b: Array[Byte]): QSketchState =
    QSketchState.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int)
      : QuantileSketchMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int)
      : QuantileSketchMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketchMergeAgg =
    copy(sketch = c(0))
  override def prettyName: String = "quantile_sketch_merge"
}

/** Scalar: quantile point query against a serialized sketch. */
case class QSketchQuery(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "quantile_sketch_query expects (BINARY, DOUBLE), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(sketch: Any, p: Any): Any =
    QSketchState.querySerialized(sketch.asInstanceOf[Array[Byte]],
      p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = QSketchState.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      (s, p) => s"${ev.value} = $cls.querySerialized($s, $p);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QSketchQuery =
    copy(left = l, right = r)
  override def prettyName: String = "quantile_sketch_query"
}

object QuantileSketch {
  def agg(value: Column, relativeError: Double = 0.01): Column =
    GraftBridge.column(QuantileSketchAgg(GraftBridge.expression(value),
      relativeError).toAggregateExpression())

  def mergeAgg(sketch: Column): Column =
    GraftBridge.column(QuantileSketchMergeAgg(
      GraftBridge.expression(sketch)).toAggregateExpression())

  def query(sketch: Column, p: Column): Column =
    GraftBridge.column(QSketchQuery(GraftBridge.expression(sketch),
      GraftBridge.expression(p)))
}
