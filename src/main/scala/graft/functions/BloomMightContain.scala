package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(key)` over a BROADCAST bloom filter — the probe side
  * of a bloom semi-join. The sketch ships to executors once via the
  * broadcast (not per-task in the serialized expression tree), and the
  * probe compiles into whole-stage codegen as a single virtual call, so
  * the filter runs at scan speed BEFORE any exchange.
  *
  * False positives pass (and are eliminated by the real join that
  * follows); false negatives cannot occur — pruning never drops a
  * matching row.
  */
case class BloomMightContain(child: Expression, bf: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint key, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(key: Any): Any =
    bf.value.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // the broadcast handle is a reference object; .value() resolves to
    // the executor-local sketch (fetched once per executor)
    val bfRef = ctx.addReferenceObj("bloomBcast", bf,
      classOf[Broadcast[BloomFilter]].getName)
    val sketchCls = classOf[BloomFilter].getName
    defineCodeGen(ctx, ev, key =>
      s"(($sketchCls) $bfRef.value()).mightContainLong($key)")
  }

  override protected def withNewChildInternal(c: Expression)
      : BloomMightContain = copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  def column(key: Column, bf: Broadcast[BloomFilter]): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), bf))
}
