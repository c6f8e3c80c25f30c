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
    * (score desc, id asc). `Double.compare` (not `<`) keeps the order
    * TOTAL when NaN appears: NaN ranks above every number — matching
    * Spark's SQL ordering for doubles — where raw comparisons (all
    * false on NaN) would corrupt the heap invariant and make results
    * depend on arrival order. */
  @inline private def worse(i: Int, score: Double, id: Long): Boolean = {
    val c = java.lang.Double.compare(scores(i), score)
    c < 0 || (c == 0 && ids(i) > id)
  }

  def insert(score0: Double, id: Long): Unit = {
    // normalize -0.0 → 0.0 so the total order can't split a SQL-equal
    // score pair (Spark compares -0.0 == 0.0; Double.compare does not)
    val score = score0 + 0.0d
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

  /** Indices 0..n-1 ordered (score desc, id asc); NaN first, like
    * Spark's descending double order. */
  def sortedIdx: Array[Int] = {
    val idx = Array.range(0, n)
    // heap order is not sorted order — sort the (tiny) final k
    scala.util.Sorting.stableSort(idx, (a: Int, b: Int) => {
      val c = java.lang.Double.compare(scores(a), scores(b))
      c > 0 || (c == 0 && ids(a) < ids(b))
    })
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

  /** Guard for call sites that cast an id column to long on the way
    * into the heap: a non-numeric id (UUID/string) under a non-ANSI
    * plain cast becomes NULL for EVERY row, the heap skips nulls, and
    * the caller gets an empty result with no error. Fail loudly
    * instead; string-keyed callers must hash to a surrogate id first. */
  def requireIntegralId(df: org.apache.spark.sql.DataFrame,
      colName: String, context: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(colName).dataType
    require(Seq[DataType](LongType, IntegerType, ShortType, ByteType)
      .contains(dt),
      s"$context needs an integral id column; got " +
        s"$colName: ${dt.simpleString} (cast('long') would null it " +
        "out and the heap would silently drop every row)")
  }

  def column(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKByScore(
      GraftBridge.expression(score),
      GraftBridge.expression(id), k).toAggregateExpression())

  /** The canonical unpack: group → bounded-heap top-k → one output row
    * per kept entry, ranked 1..k by (score desc, id asc) in an int
    * `rnCol`. Rows with a null score or id are SKIPPED (they cannot
    * enter the heap) — callers that need null scores ranked must
    * impute first. Keeping this in one place keeps the tie-break and
    * rank conventions identical across every top-k call site. */
  def explodeTopK(df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String], score: Column, id: Column, k: Int,
      outId: String, outScore: String, rnCol: String = "rn")
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, posexplode}
    val g = groupCols.map(col)
    df.groupBy(g: _*)
      .agg(column(score, id, k).as("__top"))
      .select(g :+ posexplode(col("__top")).as(Seq("__p", "__e")): _*)
      .select(g ++ Seq(
        col("__e.id").as(outId), col("__e.score").as(outScore),
        (col("__p") + 1).cast("int").as(rnCol)): _*)
  }
}
