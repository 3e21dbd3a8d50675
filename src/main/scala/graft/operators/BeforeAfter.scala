package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Purchase before/after exposure lift: households' brand vs category
  * purchase volumes in the weeks before vs after their first media
  * exposure, with day-weighted ratios and a 4-bit contingency table.
  *
  * Semantics: /root/reference/metrics/lib/hh_before_after.py
  * (construct_hh_first:5-22, filter_to_range:60-77,
  * create_before_after:49-51, agg_by_hh:54-58, add_zero_purch:37-44,
  * add_weights:92-102, make_counts:105-121, sum_bef_aft:124-131,
  * calc_metrics:134-145, main:157-176).
  *
  * Spark-first notes:
  *  - the reference `collect()`s two scalar aggregates (max purchase
  *    date, min exposure date) to the driver and re-literalizes them;
  *    here they stay distributed as broadcast single-row frames
  *    crossed into the plan — no driver round-trip, no job barrier.
  *  - `calc_metrics` runs in pandas in the reference; here the final
  *    ratio arithmetic is plain Column expressions over the ≤4-row
  *    aggregated frame (same plan, no collect).
  *  - the anti-join balancing (`add_zero_purch`) uses left_anti joins
  *    (the reference emulates one with a left_outer + isNull filter).
  *  - the reference repartitions the raw frame to 100 partitions by
  *    household; we leave partitioning to AQE — every downstream agg
  *    keys on household_id anyway, so the exchange is shared.
  */
object BeforeAfter {

  /** Raw household frame: first exposure date per household (leftsemi
    * universe), outer-joined purchases, exposure flag, max/min date
    * bounds. Mirrors construct_hh_first (hh_before_after.py:5-22). */
  def constructHHFirst(purch: DataFrame, expo: DataFrame, univ: DataFrame): DataFrame = {
    val firstExpo = expo
      .groupBy(col("household_id"))
      .agg(min(col("date")).as("date"))
      .join(univ.select(col("household_id")), Seq("household_id"), "left_semi")
    val joined = firstExpo.join(purch, Seq("household_id"), "full_outer")
    val maxDt = purch.groupBy().agg(max(col("pdate")).as("max_dt"))
    val minDt = expo.groupBy().agg(min(col("date")).as("min_dt"))
    joined
      .crossJoin(broadcast(maxDt))
      .crossJoin(broadcast(minDt))
      .withColumn(
        "hh_exposed",
        when(col("date").isNull, lit("not exposed")).otherwise(lit("exposed")))
      .withColumn(
        "date",
        when(col("date").isNull, col("min_dt")).otherwise(col("date")))
      .drop("min_dt")
  }

  /** Keep purchases inside the min/max-week window around the exposure
    * date; weight = number of observable post days. Mirrors
    * filter_to_range (hh_before_after.py:60-77). */
  def filterToRange(df: DataFrame, minWks: Int, maxWks: Int): DataFrame = {
    val postWeekMax = date_add(col("date"), maxWks * 7 - 1)
    val postLimit = when(col("max_dt") < postWeekMax, col("max_dt")).otherwise(postWeekMax)
    val numDaysPost = datediff(postLimit, col("date")) + 1
    df.where(
      (datediff(col("date"), col("pdate")) < numDaysPost) &&
        (col("pdate") <= postLimit) &&
        (numDaysPost >= minWks * 7))
      .withColumn("wgt", numDaysPost)
  }

  /** bef_aft label + per-(household, side, exposure) aggregation.
    * Mirrors create_before_after + agg_by_hh (:49-58). */
  def aggByHH(df: DataFrame): DataFrame =
    df.withColumn(
      "bef_aft",
      when(col("pdate") < col("date"), lit("before")).otherwise(lit("after")))
      .groupBy(col("household_id"), col("bef_aft"), col("hh_exposed"))
      .agg(
        max(col("wgt")).as("wgt"),
        sum(col("volume_tgt")).as("volume_tgt"),
        sum(col("volume_cat")).as("volume_cat"))

  /** Balance the panel: households present on one side only get a
    * zero-volume row on the other side (keeping their wgt). Mirrors
    * get_only_hh + add_zero_purch (:25-44).
    *
    * The reference builds this with two anti-joins + a 3-way union —
    * four references to the aggregated frame, so Spark recomputes its
    * subtree four times and shuffles for each anti-join. Same
    * semantics in ONE pass: conditional-pivot the ≤2 rows per
    * (household, exposure) and stack both sides back with
    * coalesce-to-zero fills (row-local, no extra shuffle). */
  def addZeroPurch(df: DataFrame): DataFrame = {
    def side(s: String, c: String) =
      max(when(col("bef_aft") === s, col(c))).as(s"${c}_$s")
    val pv = df
      .groupBy(col("household_id"), col("hh_exposed"))
      .agg(
        side("before", "wgt"), side("before", "volume_tgt"), side("before", "volume_cat"),
        side("after", "wgt"), side("after", "volume_tgt"), side("after", "volume_cat"))
    pv.select(
      col("household_id"),
      col("hh_exposed"),
      expr(
        """stack(2,
           'before', coalesce(wgt_before, wgt_after),
             coalesce(volume_tgt_before, cast(0.0 as double)),
             coalesce(volume_cat_before, cast(0.0 as double)),
           'after', coalesce(wgt_after, wgt_before),
             coalesce(volume_tgt_after, cast(0.0 as double)),
             coalesce(volume_cat_after, cast(0.0 as double)))
           AS (bef_aft, wgt, volume_tgt, volume_cat)"""))
      .select(col("household_id"), col("bef_aft"), col("hh_exposed"),
        col("wgt"), col("volume_tgt"), col("volume_cat"))
  }

  /** Brand-buyer flag + day-weighted volume columns. Mirrors
    * add_only_bb_hh + add_weights (:80-102). The reference builds the
    * brand-buyer set as a distinct frame and joins it back; the set is
    * O(households) — not broadcastable at scale — so here the flag is
    * a window max over household_id (one exchange on the key every
    * downstream agg shares). */
  def addWeights(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("household_id"))
    val df2 = df
      .withColumn("brandbuyer",
        max(when(col("volume_tgt") > 0, 1).otherwise(0)).over(w))
      .withColumn("volume_cat_bb", col("volume_cat") * col("brandbuyer"))
      .drop("brandbuyer")
    df2
      .withColumn("brand_wgt", col("volume_tgt") * col("wgt"))
      .withColumn("category_wgt", col("volume_cat") * col("wgt"))
      .withColumn("category_wgt_bb", col("volume_cat_bb") * col("wgt"))
      .withColumn("bwgt", when(col("volume_tgt") > 0, col("wgt")))
      .withColumn("cwgt", when(col("volume_cat") > 0, col("wgt")))
      .withColumn("cwgt_bb", when(col("volume_cat_bb") > 0, col("wgt")))
  }

  /** Full weighted per-household frame. Mirrors get_before_after
    * (:148-154). */
  def getBeforeAfter(raw: DataFrame, minWks: Int, maxWks: Int): DataFrame =
    addWeights(addZeroPurch(aggByHH(filterToRange(raw, minWks, maxWks))))

  /** Final ratio table grouped by (hh_exposed, bef_aft). Mirrors
    * sum_bef_aft + calc_metrics + main's column order (:124-176). */
  def metrics(weights: DataFrame): DataFrame = {
    val sumCols = Seq("volume_tgt", "volume_cat", "volume_cat_bb", "bwgt",
      "cwgt", "cwgt_bb", "brand_wgt", "category_wgt", "category_wgt_bb", "wgt")
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      Seq("bwgt", "cwgt", "cwgt_bb").map(c => count(col(c)).as(c + "_cnt"))
    val g = weights.groupBy(col("bef_aft"), col("hh_exposed")).agg(aggs.head, aggs.tail: _*)
    // zero-able denominators (volume sums over all-balanced-zero
    // groups, counts over empty weight sets) go through nullif so both
    // engines yield NULL — Spark's non-ANSI x/0 is NULL but DuckDB's
    // IEEE double x/0 is inf/NaN, so without the guard the oracles
    // only agree while the data happens to avoid zeros. nullif is the
    // identity on every non-zero value, so expression trees (and
    // hashes) are unchanged otherwise.
    // the inner quotient (weight sum / count) is itself a denominator
    // and the weight SUM can be zero even when the count isn't (all
    // matching rows carrying wgt = 0) — guard the quotient, not just
    // the count
    val bwgtMean =
      col("brand_wgt") / nullif(col("bwgt") / nullif(col("bwgt_cnt"), lit(0)), lit(0.0))
    val cwgtMean =
      col("category_wgt") / nullif(col("cwgt") / nullif(col("cwgt_cnt"), lit(0)), lit(0.0))
    val cwgtBbMean =
      col("category_wgt_bb") /
        nullif(col("cwgt_bb") / nullif(col("cwgt_bb_cnt"), lit(0)), lit(0.0))
    g.select(
      col("hh_exposed"),
      col("bef_aft"),
      col("volume_tgt"),
      col("volume_cat"),
      (col("volume_tgt") / nullif(col("volume_cat"), lit(0.0))).as("ratio"),
      bwgtMean.as("brand_wgt"),
      cwgtMean.as("category_wgt"),
      (bwgtMean / nullif(cwgtMean, lit(0.0))).as("weighted_ratio"),
      col("bwgt_cnt"),
      col("cwgt_cnt"),
      (col("bwgt_cnt").cast("double") / nullif(col("cwgt_cnt"), lit(0))).as("i_ratio"),
      col("volume_cat_bb"),
      (col("volume_tgt") / nullif(col("volume_cat_bb"), lit(0.0))).as("ratio_bb"),
      cwgtBbMean.as("category_wgt_bb"),
      (bwgtMean / nullif(cwgtBbMean, lit(0.0))).as("weighted_ratio_bb"),
      col("cwgt_bb_cnt"),
      (col("bwgt_cnt").cast("double") / nullif(col("cwgt_bb_cnt"), lit(0))).as("i_ratio_bb"),
      col("wgt"))
      .orderBy(asc("hh_exposed"), desc("bef_aft"))
  }

  /** 4-bit contingency table over exposed households. Mirrors
    * make_counts (:105-121): pivot before/after volume sums per
    * household, derive bb/bc/ab/ac flags, count combinations. */
  def contingency(weights: DataFrame): DataFrame = {
    val hh = weights
      .groupBy(col("bef_aft"), col("household_id"))
      .agg(sum(col("volume_tgt")).as("vt"), sum(col("volume_cat")).as("vc"))
      .na.fill(0.0, Seq("vt", "vc"))
    val pv = hh
      .groupBy(col("household_id"))
      .pivot("bef_aft", Seq("before", "after"))
      .agg(sum(col("vt")).as("vt"), sum(col("vc")).as("vc"))
      .na.fill(0.0)
    pv.withColumn("bb", when(col("before_vt") > 0, 1).otherwise(0))
      .withColumn("bc", when(col("before_vc") > col("before_vt"), 1).otherwise(0))
      .withColumn("ab", when(col("after_vt") > 0, 1).otherwise(0))
      .withColumn("ac", when(col("after_vc") > col("after_vt"), 1).otherwise(0))
      .groupBy(col("bb"), col("bc"), col("ab"), col("ac"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("bb"), col("bc"), col("ab"), col("ac"))
  }

  /** Welch two-sample t-test of mean `value` between every event-type
    * pair — the experiment-readout step after [[beforeAfterLift]]
    * shows a difference: is the gap real or noise. Unequal variances
    * assumed (Welch), with the Welch–Satterthwaite degrees of
    * freedom, and a fixed 1.96 two-sided flag (the α=.05 normal
    * approximation — df here is in the thousands, where t ≈ z).
    *
    * Exactness: values move to integer CENTS first (the dailyPartials
    * discipline), so the moments (n, Σc, Σc²) are exact bigint in any
    * shuffle order; means/variances recover in DOUBLE with the
    * identical operation order in the oracle (the variance-in-double
    * form — the integer form n·Σc²−(Σc)² would overflow at ~6·10⁴
    * rows of ~5·10⁴-cent values). Sample variance applies the
    * n/(n−1) correction as its own double step. Shape: one map-side-
    * combining aggregate to the types frame, pair join and the t/df
    * chain all types²-sized. */
  def welchPairs(events: DataFrame, tCrit: Double = 1.96): DataFrame = {
    val m = events.where(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
      .withColumn("mean_c", col("s").cast("double") / col("n"))
      .withColumn("var_c",
        (col("ss").cast("double") / col("n") -
          (col("s").cast("double") / col("n")) *
            (col("s").cast("double") / col("n"))) *
          (col("n").cast("double") / (col("n") - 1)))
    val b = m.select(col("event_type").as("type_b"), col("n").as("n_b"),
      col("mean_c").as("mean_b"), col("var_c").as("var_b"))
    val se2 = col("var_c") / col("n") + col("var_b") / col("n_b")
    m.join(b, col("event_type") < col("type_b"))
      .select(col("event_type").as("type_a"), col("type_b"),
        col("n").as("n_a"), col("n_b"),
        (col("mean_c") / 100.0).as("mean_a"),
        (col("mean_b") / 100.0).as("mean_b"),
        ((col("mean_c") - col("mean_b")) / sqrt(se2)).as("t_stat"),
        ((se2 * se2) /
          ((col("var_c") / col("n")) * (col("var_c") / col("n")) /
            (col("n") - 1) +
           (col("var_b") / col("n_b")) * (col("var_b") / col("n_b")) /
            (col("n_b") - 1))).as("welch_df"))
      .withColumn("significant", abs(col("t_stat")) > tCrit)
      .orderBy(col("type_a"), col("type_b"))
  }
}
