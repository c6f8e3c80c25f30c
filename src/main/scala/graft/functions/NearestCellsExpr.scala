package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: the `n` nearest centroid indices for a
  * vector, by cosine similarity (descending; ties break to the smaller
  * index). The centroid codebook is a constructor field — tiny model
  * metadata (like trained k-means centroids) that serializes with the
  * task — so IVF cell assignment is a NARROW map over the corpus: no
  * crossJoin row inflation, no argmax window shuffle. One fused loop
  * per (vector, centroid) pair, fully codegen'd.
  */
case class NearestCells(child: Expression,
    centroids: Array[Array[Double]], n: Int) extends UnaryExpression {
  require(n >= 1 && n <= centroids.length,
    s"n must be in [1, ${centroids.length}]")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells requires array<double|float>, got $other")
    }
  // def, not val: child.dataType is only callable once resolved
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    NearestCells.nearest(input.asInstanceOf[ArrayData], centroids, n,
      isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = NearestCells.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val matRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $cls.nearest($c, $matRef, $n, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCells = copy(child = newChild)
  override def prettyName: String = "nearest_cells"
}

object NearestCells {

  /** Top-n centroid indices by cosine(vec, centroid) desc, index asc on
    * ties. Insertion-sort into fixed n-slot buffers (n ≤ #centroids,
    * both small). */
  def nearest(vec: ArrayData, centroids: Array[Array[Double]], n: Int,
      isFloat: Boolean): ArrayData = {
    val dim = vec.numElements()
    val sims = new Array[Double](n)
    val cells = new Array[Int](n)
    var filled = 0
    var j = 0
    while (j < centroids.length) {
      val cent = centroids(j)
      val m = math.min(dim, cent.length)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var d = 0
      while (d < m) {
        val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
        val y = cent(d)
        dot += x * y; nv += x * x; nc += y * y
        d += 1
      }
      val denom = math.sqrt(nv) * math.sqrt(nc)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      // strict > : equal-sim candidates never displace an earlier
      // (smaller-index) centroid
      var pos = 0
      while (pos < filled && sim <= sims(pos)) pos += 1
      if (pos < n) {
        val last = math.min(filled, n - 1)
        var k = last
        while (k > pos) { sims(k) = sims(k - 1); cells(k) = cells(k - 1); k -= 1 }
        sims(pos) = sim
        cells(pos) = j
        if (filled < n) filled += 1
      }
      j += 1
    }
    new GenericArrayData(cells.take(filled).map(Int.box))
  }

  def column(c: Column, centroids: Array[Array[Double]], n: Int): Column =
    GraftBridge.column(
      NearestCells(GraftBridge.expression(c), centroids, n))
}
