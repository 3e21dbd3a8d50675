package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct word n-gram shingles
  * (space-joined, FIRST-OCCURRENCE order) of a token array — exactly
  * `array_distinct(transform(sequence(1, size-(n-1)), i ->
  * concat_ws(" ", slice(toks, i, n))))`, in one pass.
  *
  * Why: higher-order-function lambdas are never whole-stage-codegen'd
  * and the composed form allocates a sliced n-array plus a
  * GenericArrayData per POSITION before array_distinct re-hashes the
  * lot — on the 100× corpus the shingle pipeline (this + the
  * per-shingle hash map) was 435 s CPU of the signatures pass that
  * every minhash-family query pays. Here each shingle is one
  * UTF8String.concatWs (which skips null tokens, the concat_ws
  * contract) into a LinkedHashSet — first-occurrence dedup, zero
  * intermediate arrays. Callers keep the `size(toks) >= n` guard
  * (TextFunctions.shingles), so the < n and NULL-input cases never
  * reach this expression. */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"graft_shingles: n=$n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    Shingles.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Shingles.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Space = UTF8String.fromString(" ")

  /** Distinct space-joined n-grams in first-occurrence order. */
  def compute(toks: ArrayData, n: Int): GenericArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      parts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String](2 * (len - n + 1))
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= len - n) {
      System.arraycopy(parts, i, window, 0, n)
      // concatWs skips null inputs — the SQL concat_ws contract
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: the 40-bit polynomial rolling hash of
  * EVERY element of a string array in one pass — exactly
  * `transform(arr, s -> graft_rolling_hash(s))` without the
  * per-element interpreted lambda dispatch (HOF bodies never reach
  * whole-stage codegen). Null elements hash to null, like the
  * null-propagating per-element expression. */
case class RollingHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_rolling_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hashes expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    RollingHashes.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RollingHashes.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

object RollingHashes {
  /** The [[RollingHash.hash]] fold (h·31 + codepoint mod 2^40) per
    * element — shares its no-String ASCII fast path. */
  def compute(arr: ArrayData): GenericArrayData = {
    val len = arr.numElements()
    val out = new Array[Any](len)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        out(i) = RollingHash.hash(arr.getUTF8String(i))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
