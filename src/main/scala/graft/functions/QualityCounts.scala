package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass quality counters for the curation scan:
  * `graft_quality_counts(text, stop...)` → [token_cnt, stop_hits,
  * alpha_cnt]. Replaces the THREE text passes the quality frame paid
  * per row — tokens() (a `[^a-z0-9]+` regexp_replace + split +
  * filter, allocating the token array), stopwordHits (an
  * array_contains filter over it), and the `[^a-z]` regexp_replace
  * that built a stripped COPY of the document just to take its
  * length — with a single byte scan of the lowercased text. The
  * quality scan is the hot path of the whole curation family
  * (quality filter/cap/norm/funnel/domain policy all start here);
  * at the 100× probe the three-pass form burned 714 s of CPU as the
  * single dominant stage, and at 100 TB it is pure scan CPU, so a
  * constant-factor on THIS loop is a constant-factor on the corpus
  * bill.
  *
  * Bit-equal to the composed form by construction, which is why the
  * unchanged regex-replay oracles keep hash-matching:
  *  - lowercasing is the same `UTF8String.toLowerCase` Spark's
  *    `lower()` calls;
  *  - a token is a maximal `[a-z0-9]` run of the lowered text — in
  *    UTF-8, every byte of a multi-byte char is ≥ 0x80, so non-ASCII
  *    separates runs exactly like the char-level regex did;
  *  - stop_hits compares each finished run against the (lowercase
  *    ASCII) stopword list byte-wise — set semantics identical to
  *    array_contains on the split tokens;
  *  - alpha_cnt counts `a-z` bytes, which equals the LENGTH of the
  *    `[^a-z]`-stripped string (all survivors are single-byte).
  * NULL text → NULL array; the quality frame coalesces the count
  * fields to the legacy size(NULL) = -1 the composed form produced.
  */
case class QualityCounts(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  require(stopwords.nonEmpty && stopwords.size <= 64,
    s"graft_quality_counts takes 1..64 stopwords, got ${stopwords.size}")
  require(stopwords.forall(w => w.nonEmpty &&
      w.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))),
    "stopwords must be non-empty lowercase ASCII [a-z0-9] words")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_quality_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quality_counts expects string, got ${other.simpleString}")
  }

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  /** One pass; called from both interpreted and generated code. */
  def run(text: UTF8String): ArrayData = {
    val lowered = text.toLowerCase
    val n = lowered.numBytes()
    val stops = stopBytes
    var tokens = 0
    var stopHits = 0
    var alpha = 0
    var runStart = -1
    var i = 0
    while (i <= n) {
      // sentinel iteration i == n closes a trailing run
      val b: Byte = if (i < n) lowered.getByte(i) else ' '.toByte
      val isAlpha = b >= 'a'.toByte && b <= 'z'.toByte
      val inTok = isAlpha || (b >= '0'.toByte && b <= '9'.toByte)
      if (isAlpha) alpha += 1
      if (inTok) {
        if (runStart < 0) runStart = i
      } else if (runStart >= 0) {
        tokens += 1
        val len = i - runStart
        var w = 0
        var hit = false
        while (!hit && w < stops.length) {
          val sw = stops(w)
          if (sw.length == len) {
            var j = 0
            while (j < len && sw(j) == lowered.getByte(runStart + j)) j += 1
            hit = j == len
          }
          w += 1
        }
        if (hit) stopHits += 1
        runStart = -1
      }
      i += 1
    }
    new GenericArrayData(Array(tokens, stopHits, alpha))
  }

  override def nullSafeEval(input: Any): Any =
    run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityCounts", this,
      classOf[QualityCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.run($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
