package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: a size-k min-heap over (score, id) where the
  * ROOT is the current worst element (lowest score, ties broken so the
  * HIGHER id is worse — matching a final ordering of score desc, id
  * asc). Insertion is O(log k); memory is O(k) regardless of how many
  * rows stream through.
  */
final class TopKState(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** a-slot is worse than (score, id) if it sorts later under
    * (score desc, id asc). */
  @inline private def worse(i: Int, score: Double, id: Long): Boolean =
    scores(i) < score || (scores(i) == score && ids(i) > id)

  def insert(score: Double, id: Long): Unit = {
    if (n < k) {
      var i = n
      scores(i) = score; ids(i) = id; n += 1
      // sift up: parent must be <= child in "worseness"
      while (i > 0 && worse(i, scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(0, score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i // find the WORST of {i, l, r} — it belongs on top
      if (l < n && worse(l, scores(w), ids(w))) w = l
      if (r < n && worse(r, scores(w), ids(w))) w = r
      if (w == i) done = true
      else { swap(i, w); i = w }
    }
  }

  def merge(other: TopKState): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Indices 0..n-1 ordered (score desc, id asc). */
  def sortedIdx: Array[Int] = {
    val idx = Array.range(0, n)
    // heap order is not sorted order — sort the (tiny) final k
    scala.util.Sorting.stableSort(idx, (a: Int, b: Int) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b)))
  }
}

/** Exact top-k-per-group as a [[TypedImperativeAggregate]]: each task
  * keeps one O(k) heap per group and partial-aggregates MAP-SIDE, so a
  * corpus-sized scored relation shuffles `groups × k` heap entries
  * instead of every scored row. This replaces the
  * `row_number().over(Window.partitionBy(group))` formulation, which
  * hash-shuffles and sorts ALL scored rows just to discard everything
  * past rank k — at 100 TB the window shuffle IS the query cost.
  *
  * Output: `array<struct<score double, id bigint>>` ordered
  * (score desc, id asc) — deterministic under ties.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score expects (double, bigint) inputs, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKState): Any = {
    val idx = buf.sortedIdx
    new GenericArrayData(idx.map { i =>
      val row = new GenericInternalRow(2)
      row.setDouble(0, buf.scores(i))
      row.setLong(1, buf.ids(i))
      row: Any
    })
  }

  override def serialize(buf: TopKState): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new TopKState(bb.getInt)
    val n = bb.getInt
    var i = 0
    // stored entries are already a valid heap — load verbatim
    while (i < n) {
      st.scores(i) = bb.getDouble; st.ids(i) = bb.getLong; i += 1
    }
    st.n = n
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  def column(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKByScore(
      GraftBridge.expression(score),
      GraftBridge.expression(id), k).toAggregateExpression())
}
