package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 40-bit polynomial rolling hash:
  * fold(h*31 + codepoint) mod 2^40 over the string's Unicode code
  * points — exactly the math of the DuckDB oracle recipe
  * (list_reduce over per-character ascii(), which yields the
  * codepoint). Iterating code points rather than UTF-16 units keeps
  * the registered graft_rolling_hash oracle-consistent on non-BMP
  * input too; on the normalized ASCII every call site feeds it, the
  * two coincide.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  private val Mod = 1099511627776L

  /** The code-point fold, without materializing a java String on the
    * (universal) ASCII path: every call site feeds graft_tokens
    * output — lowercase ASCII runs — where each UTF-8 byte IS the
    * code point, so the fold runs straight over the UTF8String's
    * bytes. The toString this replaces copied every shingle twice
    * (bytes → char[] → String) per hash; at 32 concurrent tasks that
    * churn was part of the round-13 inverse-scaling family. Any
    * high bit (multi-byte char) bails to the exact original
    * String.codePointAt loop, so non-ASCII input hashes identically
    * (multi-byte chars have every byte ≥ 0x80, so the bail precedes
    * any partial fold divergence... the fold restarts from zero). */
  def hash(u: UTF8String): Long = {
    val n = u.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = u.getByte(i)
      if (b < 0) return hashNonAscii(u)
      acc = (acc * 31 + b) % Mod
      i += 1
    }
    acc
  }

  private def hashNonAscii(u: UTF8String): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
