package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — the text
  * canonicalization every dedup/retrieval pipeline runs before
  * hashing: the same visible text can arrive precomposed (é, U+00E9)
  * or decomposed (e + U+0301) from different crawls, and without
  * canonical composition the two hash apart, splitting what should be
  * one duplicate cluster (MinHash/SimHash/exact-hash all operate on
  * bytes). The JDK's `java.text.Normalizer` implements Unicode
  * canonical composition; DuckDB's `nfc_normalize` (utf8proc) is the
  * cross-engine oracle twin (q163).
  *
  * Fast path: NFC's quick-check for plain ASCII (`Normalizer
  * .isNormalized` is O(n) with no allocation for already-normalized
  * text — the overwhelming majority of real corpora) avoids the
  * compose pass per row. Narrow in-row work inside whole-stage
  * codegen, corpus-parallel like any projected column.
  */
object TextNormalize {

  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  def column(c: Column): Column =
    GraftBridge.column(NfcNormalizeExpr(GraftBridge.expression(c)))

  /** Deterministic mixed-normalization document fixture: per (doc,
    * token) position a closed-form choice of decomposed sequences
    * (e+U+0301, a+U+0308, o+U+0302), an already-precomposed é (the
    * idempotence case), or plain ASCII — so the DuckDB oracle rebuilds
    * the exact raw strings with `chr()` and compares lengths and an
    * md5 of its own `nfc_normalize` output against ours. */
  def syntheticUnicodeDocs(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val text = (0 until (10 + i % 20)).map { j =>
        (i * 3 + j) % 5 match {
          case 0 => "we\u0301" // e + combining acute (decomposed)
          case 1 => "wa\u0308" // a + combining diaeresis (decomposed)
          case 2 => "wo\u0302" // o + combining circumflex (decomposed)
          case 3 => "w\u00e9"  // precomposed e-acute: NFC-invariant
          case _ => s"w${(i + j) % 10}"
        }
      }.mkString(" ")
      (i.toLong, text)
    }
    rows.toDF("doc_id", "text")
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    TextNormalize.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = TextNormalize.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$cls.nfc($c)")
  }
  override protected def withNewChildInternal(c: Expression)
      : NfcNormalizeExpr = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
