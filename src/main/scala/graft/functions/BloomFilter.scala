package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}

/** Shared bit math for [[BloomAgg]] / [[BloomContains]] — a plain
  * object with no companion class, so the methods compile to static
  * forwarders the generated Java can call directly.
  *
  * Blob layout: [Int numHashes][Int numWords][numWords × Long]. The
  * k probe positions use Kirsch–Mitzenmacher double hashing
  * (bit_i = h1 + i·h2 mod bits): two derived hashes give the same
  * false-positive behavior as k independent ones, and the input is
  * already an xxhash64 value so no further mixing pass is needed.
  */
object BloomFilters {
  def numWords(numBits: Int): Int = (numBits + 63) >>> 6

  def setBits(words: Array[Long], hash: Long, numHashes: Int): Unit = {
    val bits = words.length.toLong << 6
    val h2 = (hash >>> 32) * 0x9E3779B97F4A7C15L | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(hash + i * h2, bits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def contains(blob: Array[Byte], hash: Long): Boolean = {
    val bb = ByteBuffer.wrap(blob)
    val numHashes = bb.getInt()
    val nWords = bb.getInt()
    val bits = nWords.toLong << 6
    val h2 = (hash >>> 32) * 0x9E3779B97F4A7C15L | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(hash + i * h2, bits)
      val word = bb.getLong(8 + ((bit >>> 6).toInt << 3))
      if ((word & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBlob(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numHashes).putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }
}

/** Native Catalyst bloom-filter aggregate over pre-hashed (xxhash64)
  * long inputs: `graft_bloom_agg(hash, numBits, numHashes)` → binary
  * blob. Spark's own BloomFilterAggregate exists but is not registered
  * as a SQL function (it only backs runtime join filters), so
  * set-membership pruning is not otherwise expressible. The buffer is
  * a bare Array[Long]; partial aggregation merges by OR, so the
  * map-side combine ships one fixed-size bitset per task regardless
  * of input size — the property that makes a 100 TB corpus reducible
  * to a broadcastable membership summary. */
case class BloomAgg(child: Expression, numBitsExpr: Expression,
                    numHashExpr: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val numBits: Int =
    numBitsExpr.eval(null).asInstanceOf[Number].intValue()
  private lazy val numHashes: Int =
    numHashExpr.eval(null).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, numBitsExpr, numHashExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg expects a BIGINT hash input (use xxhash64), " +
          s"got ${child.dataType.simpleString}")
    else if (!numBitsExpr.foldable || !numHashExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_agg numBits/numHashes must be literals")
    else if (numBits <= 0 || numHashes <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg needs positive sizing, got bits=$numBits k=$numHashes")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomFilters.numWords(numBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilters.setBits(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomFilters.toBlob(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren(0), numBitsExpr = newChildren(1),
      numHashExpr = newChildren(2))
}

/** `graft_bloom_contains(blob, hash)` → boolean. Codegen'd (a static
  * helper call, so probes stay inside whole-stage codegen); false
  * positives are possible by construction, false negatives are not —
  * callers use it to PRUNE an exact check, never to replace one. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(blob: Any, hash: Any): Any =
    BloomFilters.contains(blob.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, hash) =>
      s"${ev.value} = graft.functions.BloomFilters.contains($blob, $hash);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
