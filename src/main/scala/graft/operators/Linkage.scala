package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: find records that refer to the
  * same real-world entity despite textual drift (re-keyed re-imports,
  * typo'd names, adjusted balances). The 100 TB shape is the classic
  * ER two-step — a cheap perturbation-invariant BLOCKING key bounds
  * the candidate set, then the expensive pairwise similarity runs
  * only within blocks — so the cross product never exists: one
  * shuffle of the corpus by block key, quadratic work only inside
  * blocks whose size the key design bounds (here nation × low name
  * digits: uniform by construction; a skewed block key would need the
  * same salting treatment as [[Skew]]).
  */
object Linkage {

  /** Key offset for planted duplicate records — far above any real
    * c_custkey at every tested SF, so planted keys never collide. */
  val DupKeyOffset = 10000000L

  /** Deterministic duplicate planting — the oracle fixture for
    * [[entityMatch]] (the synthetic customer table is typo-free, so
    * an unplanted matcher would emit only the accidental neighbor
    * collisions): every c_custkey % 10 == 3 customer is re-imported
    * under a new key with one name character deleted (position 10,
    * the first digit — an edit distance of exactly 1) and the balance
    * drifted by a dyadic 0.25 (bit-exact in any engine). */
  def plantDupes(customers: DataFrame): DataFrame =
    customers.unionByName(
      customers.where(pmod(col("c_custkey"), lit(10)) === 3)
        .withColumn("c_custkey", col("c_custkey") + DupKeyOffset)
        .withColumn("c_name", concat(substring(col("c_name"), 1, 9),
          expr("substring(c_name, 11)")))
        .withColumn("c_acctbal", col("c_acctbal") + lit(0.25)))

  /** Corpus-derived blocking width — the same derive-from-the-corpus
    * contract as [[VectorSearch.srpParamsFor]]. The block domain is
    * `nationCount` × 10^width (the trailing name characters are
    * digits, uniform by construction), so expected block size is
    * n / (nationCount·10^width) and within-block pair work per block
    * is its square: a FIXED width makes total candidate pairs grow as
    * n²/blocks — fine at sf0.1, ~450G candidate pairs at 150M rows.
    * Width is the smallest that keeps expected block size ≤
    * `targetBlock`: ceil(log₁₀(n / (nationCount·targetBlock))),
    * clamped to [3, 8] — 3 preserves the small-corpus behavior, 8
    * because the 9-digit name tail's FIRST digit is the character the
    * planted deletion removes (a 9-char key would split true dupes
    * across blocks). Pinned at 1e6→3, 1e8→5, 1e10→7 by LinkageSpec;
    * the oracle replays the same formula in SQL off count(*). */
  def blockCharsFor(n: Long, nationCount: Int = 25,
                    targetBlock: Int = 64): Int = {
    require(n > 0, "blockCharsFor needs a positive corpus count")
    val raw = math.ceil(math.log10(
      n.toDouble / (nationCount.toDouble * targetBlock))).toInt
    math.min(8, math.max(3, raw))
  }

  /** Blocking key: nation × the name's LAST `width` characters. The
    * trailing digits survive the high-position typo edits this matcher
    * targets (unlike a prefix, which is constant across the whole
    * corpus — "Customer#000…" would put everything in one block), and
    * they distribute uniformly, so block sizes stay balanced as the
    * table grows. */
  private def blockKey(name: Column, nation: Column, width: Int): Column =
    concat(nation.cast("string"), lit("|"),
      substring(name, -width, width))

  /** Blocked fuzzy self-match: candidate pairs share a block, then
    * match when the name edit distance is ≤ `maxLev`, the market
    * segment agrees, and the balances are within `balTol`. Emits one
    * row per matched pair (lower key first) with the per-field
    * evidence — a linkage report, not a verdict: accidental neighbor
    * collisions (keys differing in one digit with close balances) are
    * genuine output, deterministically reproduced by the oracle.
    * Pass `corpusCount` to have the blocking width derived via
    * [[blockCharsFor]] (one cheap count action caller-side); without
    * it the width floors at 3 — the sf-small regime. */
  def entityMatch(customers: DataFrame, maxLev: Int = 1,
                  balTol: Int = 100,
                  corpusCount: Option[Long] = None): DataFrame = {
    val width = corpusCount.map(blockCharsFor(_)).getOrElse(3)
    val c = customers.select(
      col("c_custkey").as("k"), col("c_name").as("nm"),
      col("c_nationkey").as("nk"), col("c_acctbal").as("bal"),
      col("c_mktsegment").as("seg"))
      .withColumn("blk", blockKey(col("nm"), col("nk"), width))
    val a = c.as("a")
    val b = c.as("b")
    // Predicate order is load-bearing: And short-circuits in codegen
    // and Catalyst keeps the user's conjunct order, so the cheap
    // integer/double guards run BEFORE the levenshtein — measured
    // 14.1 → ~5 s at the sf1 probe, where the unbounded lev-first
    // order paid ~5.6 µs on every hash-matched pair. The lev itself
    // is the THRESHOLD variant (banded DP, early exit; returns -1
    // above the bound — exact within it, so the oracle's plain
    // `levenshtein(...) <= maxLev` replays identically).
    a.join(b, col("a.blk") === col("b.blk"))
      .where(col("a.k") < col("b.k") &&
        col("a.seg") === col("b.seg") &&
        abs(col("a.bal") - col("b.bal")) <= balTol &&
        levenshtein(col("a.nm"), col("b.nm"), maxLev) >= 0)
      .select(col("a.k").as("a_key"), col("b.k").as("b_key"),
        levenshtein(col("a.nm"), col("b.nm")).as("name_lev"),
        abs(col("a.bal") - col("b.bal")).as("bal_diff"),
        col("a.seg").as("segment"))
      .orderBy(col("a_key"), col("b_key"))
  }
}
