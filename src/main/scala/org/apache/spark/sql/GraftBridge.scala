package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion for graft's
  * custom Catalyst expressions (Spark 4 removed the public
  * `new Column(expr)` constructor). Standard extension-library pattern.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Nullability-insensitive type equality (`asNullable` is
    * `private[spark]`): fresh in-memory batches carry non-nullable
    * primitives / containsNull=false arrays where parquet read-back
    * is all-nullable — that difference is not a retype. */
  def sameTypeIgnoreNullability(a: types.DataType,
      b: types.DataType): Boolean = a.asNullable == b.asNullable

  /** Drain the listener bus (`listenerBus` is `private[spark]`) — lets
    * specs count Spark jobs deterministically after a driver call. */
  def waitListenerEmpty(spark: SparkSession): Unit = spark match {
    case c: classic.SparkSession =>
      c.sparkContext.listenerBus.waitUntilEmpty()
    case _ => ()
  }

  /** Stable per-session identity (`sessionUUID` is `private[sql]`).
    * Exotic non-classic sessions fall back to JVM object identity —
    * still never shared across distinct session objects. */
  def sessionUUID(spark: SparkSession): String = spark match {
    case c: classic.SparkSession => c.sessionUUID
    case other => s"ident-${System.identityHashCode(other)}"
  }
}
