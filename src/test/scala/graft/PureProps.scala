package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.{Multimodal, NearDup}

/** Property checks for the engine's pure (driver-side) primitives. */
object PureProps extends Properties("graft") {

  property("minhash coefficients are odd, bounded, deterministic") =
    Prop.forAll(Gen.choose(1, 128)) { k =>
      val c1 = NearDup.minhashCoefficients(k)
      val c2 = NearDup.minhashCoefficients(k)
      c1 == c2 && c1.size == k && c1.forall { case (a, b) =>
        a % 2 == 1 && a > 0 && a < (1L << 20) && b >= 0 && b < NearDup.HashMod
      }
    }

  private val mediaRow = for {
    id <- Gen.choose(0L, 1000000L)
    bytes <- Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
    fmt <- Gen.oneOf("jpeg", "png", "webp")
  } yield Multimodal.MediaRow(id, bytes.toArray, fmt)

  property("stub codec is deterministic with bounded geometry") =
    Prop.forAll(mediaRow) { r =>
      val f1 = Multimodal.StubCodec.decode(r)
      val f2 = Multimodal.StubCodec.decode(r)
      f1 == f2 &&
        f1.byte_len == r.content.length &&
        f1.width >= 16 && f1.width < 656 &&
        f1.height >= 16 && f1.height < 496 &&
        f1.n_frames >= 1 && f1.n_frames <= 30
    }

  property("semantic centroid count keeps per-cell work bounded") =
    Prop.forAll(Gen.choose(1L, 1000000000000L), Gen.choose(1, 100000)) {
      (n, target) =>
        if (math.ceil(n.toDouble / target) > Int.MaxValue)
          // over-cap regimes must fail loud, never silently re-grow cells
          Prop(scala.util.Try(
            graft.operators.VectorSearch.semanticCentroidCountFor(n, target))
            .isFailure)
        else {
          val k = graft.operators.VectorSearch.semanticCentroidCountFor(n, target)
          // enough cells that expected occupancy <= target, but never
          // more cells than a one-smaller count could also satisfy
          Prop(k >= 1 && k.toLong * target >= n &&
            (k == 1 || (k.toLong - 1) * target < n))
        }
    }
}
