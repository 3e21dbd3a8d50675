package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer: `graft_tokens(text)` → the [a-z0-9] runs of the
  * lowercased text, as one byte pass. This IS
  * [[TextFunctions.tokens]] — the composed form (a `[^a-z0-9]+`
  * regexp_replace building a normalized COPY of the document, a
  * split, and a lambda filter dropping empties) is the single most
  * pervasive primitive in the text stack (token counts, vocab/zipf/
  * pmi, BPE, chunking, shingles for every dedup family, corpus
  * card), so its constant factor is a corpus-bill constant factor at
  * 100 TB the same way the quality scan's was.
  *
  * Bit-equal to the composed form by the [[QualityCounts]] case
  * analysis: same `UTF8String.toLowerCase`; every byte of a
  * multi-byte char is ≥ 0x80, so non-ASCII separates runs exactly
  * like the char-level regex; runs are emitted in order as zero-copy
  * views over the lowered buffer. NULL text → NULL (the composed
  * chain null-propagates); empty / token-less text → empty array
  * (split-then-filter dropped the empties). */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects string, got ${other.simpleString}")
  }

  @inline private def isTok(b: Byte): Boolean =
    (b >= 'a'.toByte && b <= 'z'.toByte) ||
      (b >= '0'.toByte && b <= '9'.toByte)

  /** Two byte passes — count runs, then fill an exact-size array;
    * called from both interpreted and generated code. The growable
    * ArrayBuffer this replaces re-allocated and copied its boxed
    * backing array ~log(tokens) times per document, allocation churn
    * that scaled badly across 32 concurrent tasks (the round-13
    * inverse-scaling family); the extra run-count pass is a pure
    * byte scan with no allocation. */
  def run(text: UTF8String): ArrayData = {
    val lowered = text.toLowerCase
    val bytes = lowered.getBytes
    val n = bytes.length
    var runs = 0
    var inRun = false
    var i = 0
    while (i < n) {
      val t = isTok(bytes(i))
      if (t && !inRun) runs += 1
      inRun = t
      i += 1
    }
    val out = new Array[Any](runs)
    var k = 0
    var runStart = -1
    i = 0
    while (i <= n) {
      val t = i < n && isTok(bytes(i))
      if (t) {
        if (runStart < 0) runStart = i
      } else if (runStart >= 0) {
        out(k) = UTF8String.fromBytes(bytes, runStart, i - runStart)
        k += 1
        runStart = -1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenize", this, classOf[Tokenize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.run($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
