package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the classic
  * compression-ratio quality signal for training-data curation:
  * templated/repetitive text compresses far below prose, so
  * `deflate_len / raw_len` separates boilerplate and spam from
  * natural documents with ONE row-local pass and no vocabulary.
  * Deterministic for a given input (fixed level, fixed strategy, one
  * whole-buffer deflate call), so results are stable across runs,
  * partitions and retries; the JDK's zlib is the only dependency.
  * Codegen emits a single virtual call; the Deflater is allocated per
  * call — zlib setup is microseconds against the per-document
  * compress cost, and sharing one across rows would make the
  * expression thread-unsafe under whole-stage codegen.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len expects string, got ${other.simpleString}")
  }

  def run(text: UTF8String): Int = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](bytes.length + 64)
      var total = 0
      while (!d.finished()) {
        val n = d.deflate(buf)
        total += n
      }
      total
    } finally d.end()
  }

  override def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateLen", this, classOf[DeflateLen].getName)
    defineCodeGen(ctx, ev, c => s"$ref.run($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
