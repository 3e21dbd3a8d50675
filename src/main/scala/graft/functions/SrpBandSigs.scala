package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL sign-random-projection band
  * signatures of a float vector in one call — `nPlanes` sequential
  * double-fold projections against the deterministic [[SrpBandSigs
  * .planes]] hyperplanes, each sign a '0'/'1' character, grouped into
  * `nPlanes / perBand` comma-joined signature strings (exactly the
  * `concat_ws(",", (graft_dot(e, plane_i) >= 0)::int …)` column
  * chain it replaces).
  *
  * Why one expression instead of one `graft_dot` column per plane:
  * the per-plane formulation generates a whole-stage-codegen consume
  * method that grows with the DERIVED plane count, and past ~8k
  * bytecodes HotSpot refuses to JIT it — the 100× probe measured the
  * 48-plane sign pass at 29.8 s codegen'd vs 0.4 s interpreted (a
  * 75× cliff: the "optimized" path ran in the bytecode interpreter).
  * Corpus-derived parameters make the width a function of DATA SIZE,
  * so the cliff is guaranteed at exactly the scale the derivation is
  * for. Here the generated code is one static call
  * ([[SrpBandSigs.compute]] — a plain JIT-friendly Scala loop shared
  * by eval and codegen), so method size is constant in the plane
  * count.
  *
  * Bit-exactness: accumulation is the same left-to-right double fold
  * over `min(|embedding|, dim)` elements as [[DotProduct]]; the sign
  * test is `!(acc < 0)`, which classifies NaN as '1' exactly like the
  * SQL `acc >= 0` it replaces (Spark and DuckDB both order NaN above
  * every number). Planes are generated from the same fixed seed as
  * [[graft.operators.VectorSearch.srpPlanes]] (which delegates here),
  * so plane i is identical whatever the total — the prefix-stability
  * the oracle's 64-plane literal table relies on. */
case class SrpBandSigs(child: Expression, nPlanes: Int, perBand: Int,
                       dim: Int) extends UnaryExpression {

  require(nPlanes > 0 && perBand > 0 && nPlanes % perBand == 0,
    s"graft_srp_sigs: nPlanes=$nPlanes must be a positive multiple of " +
      s"perBand=$perBand")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_srp_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_sigs expects array<float>, got ${other.simpleString}")
  }

  // one flat (nPlanes × dim) plane buffer per expression instance,
  // regenerated on each executor after serialization
  @transient private lazy val flat: Array[Float] =
    SrpBandSigs.flatPlanes(nPlanes, dim)

  override def nullSafeEval(a: Any): Any =
    SrpBandSigs.compute(a.asInstanceOf[ArrayData], flat, nPlanes, perBand, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpPlanes", flat, "float[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.SrpBandSigs.compute(
         |  $a, $ref, $nPlanes, $perBand, $dim);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBandSigs =
    copy(child = newChild)
}

object SrpBandSigs {
  /** Deterministic ±1 Rademacher hyperplanes, flattened row-major —
    * the generation order is the contract ([[graft.operators
    * .VectorSearch.srpPlanes]] and the SQL oracle's literal table both
    * replay it): same seed, plane-by-plane, so plane i is identical
    * whatever the total count. */
  def flatPlanes(nPlanes: Int, dim: Int): Array[Float] = {
    val rnd = new scala.util.Random(1234)
    Array.fill(nPlanes * dim)(if (rnd.nextBoolean()) 1f else -1f)
  }

  /** The hot loop, shared by interpreted eval and codegen so the
    * generated method stays one call wide: nPlanes sequential double
    * folds + band-sig assembly. */
  def compute(emb: ArrayData, flat: Array[Float], nPlanes: Int,
              perBand: Int, dim: Int): GenericArrayData = {
    val n = math.min(emb.numElements(), dim)
    val bands = nPlanes / perBand
    val sigs = new Array[UTF8String](bands)
    val sb = new java.lang.StringBuilder(2 * perBand)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < perBand) {
        val base = (b * perBand + r) * dim
        var acc = 0.0
        var k = 0
        while (k < n) {
          acc += emb.getFloat(k).toDouble * flat(base + k).toDouble
          k += 1
        }
        if (r > 0) sb.append(',')
        sb.append(if (acc < 0) '0' else '1')
        r += 1
      }
      sigs(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(sigs.asInstanceOf[Array[Any]])
  }
}
