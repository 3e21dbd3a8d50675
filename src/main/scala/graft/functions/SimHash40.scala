package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd 40-bit SimHash of a token array: each token's
  * rolling hash (the exact [[RollingHash]] fold — same constants, same
  * codepoint iteration) contributes ±1 per bit position; fingerprint
  * bit j is the sign of the j-th counter. One row-local pass over the
  * tokens — the aggregation formulation (explode to a token stream +
  * 40 sum columns) paid a full doc_id hash shuffle of the token
  * stream; this removes that exchange entirely, which is the
  * difference between a shuffle-bound and a scan-bound operator at
  * 100 TB. Counters are exact integer sums (order-independent), so
  * the fingerprints are bit-identical to the aggregate formulation
  * and the DuckDB oracle. NULL token elements are skipped (the sum
  * aggregate's null-skip); an empty array yields 0 — callers filter
  * token-less docs out, as the aggregate pipeline did implicitly.
  */
case class SimHash40(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.simpleString}")
  }

  private val Mod = 1099511627776L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Long](40)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        var acc = 0L
        var ci = 0
        while (ci < s.length) {
          val cp = s.codePointAt(ci)
          acc = (acc * 31 + cp) % Mod
          ci += Character.charCount(cp)
        }
        var j = 0
        while (j < 40) {
          counts(j) += (if (((acc >> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 40) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ci = ctx.freshName("ci")
      val cp = ctx.freshName("cp")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val counts = ctx.freshName("counts")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $arr.numElements();
         |long[] $counts = new long[40];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    String $s = $arr.getUTF8String($i).toString();
         |    long $acc = 0L;
         |    int $ci = 0;
         |    while ($ci < $s.length()) {
         |      int $cp = $s.codePointAt($ci);
         |      $acc = ($acc * 31L + $cp) % ${Mod}L;
         |      $ci += Character.charCount($cp);
         |    }
         |    for (int $j = 0; $j < 40; $j++) {
         |      $counts[$j] += ((($acc >> $j) & 1L) == 1L) ? 1L : -1L;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $j = 0; $j < 40; $j++) {
         |  if ($counts[$j] > 0) $fp |= (1L << $j);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash40 =
    copy(child = newChild)
}
