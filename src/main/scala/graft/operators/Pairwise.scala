package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Media-overlap analysis, two shapes:
  *
  *  1. membership matrix — pivot the dimension into 0/1 columns per
  *     household, then count households per combination
  *     (/root/reference/metrics/lib/hh_pairwise.py:26-42);
  *  2. pairwise overlap — for every unordered pair of dimension
  *     values, the projection-weighted count of households exposed to
  *     both, plus pct-of-each-side
  *     (/root/reference/metrics/lib/hh_pairwise2.py:6-61).
  *
  * Spark-first notes: the reference builds pairs with a Python UDF
  * over `collect_set` (hh_pairwise2.py:15-17) — a per-row Python
  * round-trip and a skew risk on big sets. Here the pairs come from a
  * self-join of the deduped (household, value) frame on
  * `a.value < b.value`: whole-stage-codegen'd, no UDF, and the join is
  * a co-partitioned hash join on household_id (one shuffle, reused by
  * both sides). Percent-of-side divisors join broadcast (the per-value
  * totals frame is tiny).
  */
object Pairwise {

  /** Membership matrix: one row per observed combination of dimension
    * values with the projection-weighted household count. `values` is
    * the pivot domain (pass explicitly for plan stability — Spark
    * would otherwise run an extra distinct job). */
  def membershipMatrix(df: DataFrame, dim: String, values: Seq[String]): DataFrame = {
    val pivoted = df
      .withColumn("one", lit(1L))
      .groupBy(col("household_id"), col("projfact"))
      .pivot(dim, values)
      .max("one")
      .na.fill(0L, values)
    pivoted
      .groupBy(values.map(col): _*)
      .agg(round(sum(col("projfact"))).as("count"))
      .orderBy(desc("count") +: values.map(asc): _*)
  }

  /** Distinct (household, value, projfact) triples for `dim`. */
  private def membership(df: DataFrame, dim: String): DataFrame =
    df.select(col("household_id"), col(dim).as("value"), col("projfact"))
      .dropDuplicates("household_id", "value")

  /** Pairwise overlap with pct-of-each-side.
    * Output: (media_type_1, media_type_2, overlapping_households,
    * pct_of_media_type_1, pct_of_media_type_2), ordered by overlap
    * desc. Mirrors pair_overlap + overall_numbers + make_final_pair
    * (hh_pairwise2.py:6-35). */
  def pairwiseOverlap(df: DataFrame, dim: String): DataFrame = {
    val m = membership(df, dim)
    val a = m.select(
      col("household_id"),
      col("value").as("media_type_1"),
      col("projfact"))
    val b = m.select(col("household_id"), col("value").as("media_type_2"))
    val pairs = a
      .join(b, Seq("household_id"))
      .where(col("media_type_1") < col("media_type_2"))
      .groupBy(col("media_type_1"), col("media_type_2"))
      .agg(sum(col("projfact")).as("overlap_raw"))
    val totals = m
      .groupBy(col("value"))
      .agg(sum(col("projfact")).as("cnt"))
    pairs
      .join(broadcast(totals.withColumnRenamed("value", "media_type_1")
        .withColumnRenamed("cnt", "cnt1")), Seq("media_type_1"))
      .join(broadcast(totals.withColumnRenamed("value", "media_type_2")
        .withColumnRenamed("cnt", "cnt2")), Seq("media_type_2"))
      .select(
        col("media_type_1"),
        col("media_type_2"),
        round(col("overlap_raw")).as("overlapping_households"),
        (col("overlap_raw") / col("cnt1")).as("pct_of_media_type_1"),
        (col("overlap_raw") / col("cnt2")).as("pct_of_media_type_2"))
      .orderBy(desc("overlapping_households"), asc("media_type_1"), asc("media_type_2"))
  }

  /** Sketch twin of [[pairwiseOverlap]] for audience UNIQUES — the
    * 100 TB overlap path: per dim-value pair, estimated distinct
    * households on each side and in the intersection via HLL
    * inclusion–exclusion (|A∩B| ≈ |A|+|B|−|A∪B|, clamped at 0). The
    * exact operator self-joins the deduped membership frame — at 10⁹
    * households that join carries the whole audience per pair; here
    * the corpus collapses to ONE fixed ~KB sketch per value
    * (map-side combined, any event volume absorbed) and every pair
    * statistic derives from values²-sized sketch merges — no second
    * corpus pass, mergeable across days/partitions like the reach
    * sketches. Inclusion–exclusion COMPOUNDS sketch error (three
    * estimates feed one subtraction), so small intersections
    * disappear into the noise floor — the documented tradeoff vs the
    * exact path. Emits EVERY value pair, zero-overlap pairs included
    * (a sketch cannot prove an intersection empty), where the exact
    * operator's self-join omits them. Rows-only at the gate;
    * MetricsSpec bounds all three estimates against exact distinct
    * counts. */
  def pairwiseOverlapApprox(df: DataFrame, dim: String,
                            lgK: Int = 12): DataFrame = {
    val sk = df.groupBy(col(dim).as("value"))
      .agg(hll_sketch_agg(col("household_id"), lit(lgK)).as("sk"))
    val a = sk.select(col("value").as("media_type_1"), col("sk").as("sk1"))
    val b = sk.select(col("value").as("media_type_2"), col("sk").as("sk2"))
    a.join(b, col("media_type_1") < col("media_type_2"))
      .select(col("media_type_1"), col("media_type_2"),
        hll_sketch_estimate(col("sk1")).as("n1_est"),
        hll_sketch_estimate(col("sk2")).as("n2_est"),
        hll_sketch_estimate(hll_union(col("sk1"), col("sk2")))
          .as("union_est"))
      .withColumn("overlap_est", greatest(lit(0L),
        col("n1_est") + col("n2_est") - col("union_est")))
      .select(col("media_type_1"), col("media_type_2"), col("n1_est"),
        col("n2_est"), col("overlap_est"),
        // nullif guards the empty-sketch case (a dim value whose
        // household_id column is all NULL estimates 0): NULL pct, not
        // NaN/Infinity — the exact twin's self-join can never divide
        // by zero, so without this the sketch twin's failure mode
        // would be a poisoned double, not a visible NULL
        (col("overlap_est").cast("double") /
          nullif(col("n1_est"), lit(0L))).as("pct_of_media_type_1"),
        (col("overlap_est").cast("double") /
          nullif(col("n2_est"), lit(0L))).as("pct_of_media_type_2"))
      .orderBy(desc("overlap_est"), asc("media_type_1"),
        asc("media_type_2"))
  }
}
