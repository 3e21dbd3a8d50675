package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Near-duplicate detection over documents: exact n-gram Jaccard via
  * an inverted shingle index, MinHash+LSH banding with exact
  * verification, and SimHash fingerprints. Designed for the 100 TB
  * shape: all-pairs work only ever happens on candidate pairs that
  * share a shingle or an LSH bucket, never on the cross product.
  */
object NearDup {

  /** (doc_id, sh) distinct word-`n`-gram shingle sets. Tokens are
    * materialized in their own projection first: Spark does not
    * common-subexpression-eliminate inside higher-order-function
    * lambdas, so inlining `tokens(text)` into the shingle transform
    * would re-run the regex tokenizer per shingle (measured 50–100×
    * slower at sf0.1). */
  def shingleSets(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingles(col("toks"), n).as("sh"))

  /** Exact Jaccard pairs ≥ `threshold` via inverted index: explode
    * shingles, self-join on the shingle, count common per pair, join
    * set sizes. Any pair with jaccard > 0 shares ≥1 shingle, so the
    * index is exact (no recall loss). At scale, hot shingles are the
    * skew risk — `dfCap` drops shingles shared by more than that many
    * docs; with the default (no cap) results are exact. */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                   dfCap: Option[Int] = None): DataFrame = {
    val t = shingleSets(docs, n)
    val e0 = t.select(col("doc_id"), explode(col("sh")).as("s"))
    val e = dfCap match {
      case Some(cap) =>
        val hot = e0.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select(col("s"))
        e0.join(hot, Seq("s"), "left_anti")
      case None => e0
    }
    val common = e.as("a")
      .join(e.withColumnRenamed("doc_id", "doc_id_2").as("b"), Seq("s"))
      .where(col("doc_id") < col("doc_id_2"))
      .groupBy(col("doc_id").as("d1"), col("doc_id_2").as("d2"))
      .agg(count(lit(1)).as("common"))
    val sizes = t.select(col("doc_id"), size(col("sh")).as("n_sh"))
    common
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_sh", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_sh", "n2"), "d2")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")))
      .where(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** The 2^40 modulus shared by the portable rolling hash and the
    * MinHash permutations. */
  val HashMod: Long = 1099511627776L

  /** Affine permutation coefficients for the k MinHash functions,
    * seeded so both the Spark pipeline and the DuckDB oracle embed the
    * same constants. Bounds keep h*a+b < 2^60 — engines with strict
    * (non-wrapping) BIGINT arithmetic never overflow. */
  def minhashCoefficients(k: Int): IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    IndexedSeq.fill(k)((
      (rnd.nextInt(1 << 20) | 1).toLong,
      rnd.nextLong() & (HashMod - 1)))
  }

  /** MinHash signatures: one portable rolling hash per shingle, k
    * affine permutations of it (Broder-style), signature = per-perm
    * min. Computed as `k` min-aggregate COLUMNS over the exploded
    * (doc, shingle) frame — one hash shuffle on doc_id with map-side
    * partial mins and zero row multiplication (an earlier
    * (doc, shingle, seed) explode was 64× the rows and 100× the wall
    * time). Band keys are then built row-locally and unpivoted to
    * (doc, band, band_sig). Every step is engine-portable, so the
    * whole LSH pipeline is replayed by the DuckDB oracle. */
  private def minhashBands(docs: DataFrame, n: Int, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val coef = minhashCoefficients(k)
    val e = shingleSets(docs, n)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val hashed = e.select(col("doc_id"), rollingHash(col("s")).as("h0"))
    val sig = hashed.groupBy(col("doc_id")).agg(
      min(pmod(col("h0") * coef(0)._1 + coef(0)._2, lit(HashMod))).as("m0"),
      (1 until k).map(i =>
        min(pmod(col("h0") * coef(i)._1 + coef(i)._2, lit(HashMod))).as(s"m$i")): _*)
    val bandStructs = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        concat_ws(",", (0 until rows).map(r => col(s"m${b * rows + r}").cast("string")): _*)
          .as("band_sig"))
    }
    sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.band_sig").as("band_sig"))
  }

  /** MinHash+LSH near-dup clustering: band-bucket candidates, exact
    * Jaccard verification on candidates only, then per-doc cluster
    * assignment (rep = min doc_id among itself and verified partners).
    * Output is one row per document (doc_id, rep_id, n_dups) — the
    * pair-generation is approximate (LSH recall) but every emitted
    * pair is exactly verified. */
  def minhashDedup(docs: DataFrame, n: Int = 3, k: Int = 32, bands: Int = 16,
                   threshold: Double = 0.5): DataFrame = {
    // k=32 / r=2: at J=0.5 the candidate recall is 1-(1-J^2)^16 ≈ 0.99
    // (vs 0.64 with r=4) while halving the signature aggregation; the
    // extra false candidates are filtered by the exact verification.
    val bnd = minhashBands(docs, n, k, bands)
    // bucket by (band, band_sig) and emit pairs from each bucket's id
    // list — one pass over the signature pipeline (a self-join would
    // compute it twice) and no join blowup on hot buckets
    val cand = bnd
      .groupBy(col("band"), col("band_sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
           i -> transform(sequence(i + 1, size(ids)),
           j -> struct(element_at(ids, i) AS d1, element_at(ids, j) AS d2))))"""))
        .as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
    val t = shingleSets(docs, n)
    val verified = cand
      .join(t.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
      .join(t.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .where(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"))
    val partners = verified
      .select(col("d1").as("doc_id"), col("d2").as("partner"))
      .unionAll(verified.select(col("d2").as("doc_id"), col("d1").as("partner")))
    docs.select(col("doc_id"))
      .join(partners, Seq("doc_id"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        least(min(col("partner")), col("doc_id").cast("long")).as("rep_id"),
        count(col("partner")).as("n_dups"))
      .withColumn("rep_id", coalesce(col("rep_id"), col("doc_id")))
      .orderBy(col("doc_id"))
  }

  /** SimHash: 40-bit fingerprint from the portable rolling hash — per
    * token, each bit contributes ±1; fingerprint bit j is the sign of
    * the sum. Emits (doc_id, simhash, b0..b3 10-bit band keys) for
    * hamming-bucket grouping downstream. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), rollingHash(col("w")).as("h"))
    // 40 sum-aggregate columns (±1 per bit) instead of a (token × 40)
    // bit explode — one shuffle on doc_id with map-side partials, same
    // numbers, ~10× less shuffled volume
    val sums = tok.groupBy(col("doc_id")).agg(
      sum(shiftright(col("h"), 0).bitwiseAND(1) * 2 - 1).as("s0"),
      (1 until 40).map(j =>
        sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"s$j")): _*)
    val fp = sums.select(
      col("doc_id"),
      (0 until 40).map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
    fp.select(
      col("doc_id"),
      col("simhash"),
      col("simhash").bitwiseAND(1023).as("b0"),
      shiftright(col("simhash"), 10).bitwiseAND(1023).as("b1"),
      shiftright(col("simhash"), 20).bitwiseAND(1023).as("b2"),
      shiftright(col("simhash"), 30).bitwiseAND(1023).as("b3"))
      .orderBy(col("doc_id"))
  }
}
