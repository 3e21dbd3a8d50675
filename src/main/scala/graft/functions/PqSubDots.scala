package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: the m per-subspace dot products of two
  * float vectors in ONE pass — element j is the sequential double
  * fold of `a[j·subLen … ]·b[j·subLen … ]`, exactly
  * `graft_dot(slice(a, j·subLen+1, subLen), slice(b, …))` per
  * subspace, without materializing 2m sliced arrays per row.
  *
  * Why: PQ encoding evaluates sub-L2² distances on the corpus ×
  * codebook pair frame (n·√n rows — the documented n^1.5 blocked
  * quadratic of the ANN family). The slice-and-dot column formulation
  * paid 2m array allocations per PAIR row plus a whole-stage consume
  * method that grows with m (the [[SrpBandSigs]] JIT-cliff class);
  * here the generated code is one static call into a plain
  * JIT-compiled loop that reads both ArrayData buffers in place.
  *
  * Bit-exactness: per-subspace fold order is left-to-right in double,
  * over `min(subLen, |a|−j·subLen, |b|−j·subLen)` elements (clamped
  * at 0) — precisely the element set and order of the sliced
  * [[DotProduct]] it replaces, so the DuckDB list_reduce oracles
  * replay it unchanged. */
case class PqSubDots(left: Expression, right: Expression, m: Int,
                     subLen: Int) extends BinaryExpression {

  require(m > 0 && subLen > 0,
    s"graft_pq_subdots: m=$m and subLen=$subLen must be positive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_subdots"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_subdots expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqSubDots.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m, subLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.PqSubDots.compute(
         |  $a, $b, $m, $subLen);""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqSubDots =
    copy(left = newLeft, right = newRight)
}

object PqSubDots {
  /** The hot loop, shared by interpreted eval and codegen. */
  def compute(a: ArrayData, b: ArrayData, m: Int, subLen: Int): GenericArrayData = {
    val la = a.numElements()
    val lb = b.numElements()
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val off = j * subLen
      // the slice(pos, len) clamp: each slice holds max(0, min(len,
      // |arr| - off)) elements; the dot folds over the shorter slice
      val n = math.min(subLen,
        math.min(math.max(0, la - off), math.max(0, lb - off)))
      var acc = 0.0
      var k = 0
      while (k < n) {
        acc += a.getFloat(off + k).toDouble * b.getFloat(off + k).toDouble
        k += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}
