package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — Spark ships no
  * builtin for it, and without it a multilingual corpus silently holds
  * visually-identical strings in composed and decomposed forms
  * (café ≠ café), breaking exact dedup fingerprints, groupBys and
  * equality joins. Backed by `java.text.Normalizer` (the JDK's ICU
  * implementation of the Unicode standard algorithm), which agrees
  * string-for-string with DuckDB's `nfc_normalize` — so operators
  * built on it stay fully oracle-checkable. The fast path costs one
  * `isNormalized` check (quick-check property, no allocation) —
  * already-NFC text, i.e. almost all real text, pays almost nothing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s,
         |    java.text.Normalizer.Form.NFC)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s,
         |        java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
