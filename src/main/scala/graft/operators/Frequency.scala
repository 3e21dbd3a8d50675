package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequency distribution: exposures per household, capped at 10+,
  * projection-weighted household counts and percent-of-total per
  * frequency bucket.
  *
  * Semantics: /root/reference/metrics/lib/hh_freq.py:10-38
  * (`freq_dec`, `expo_freq`, `get_one_freq`).
  *
  * Spark-first notes: the reference computes pct-of-total in pandas
  * after collect; here it is a window over the (≤10-row) aggregated
  * frame — the percent step costs nothing and the result stays
  * distributed. projfact is integer-valued so `pct_hh` is an exact
  * ratio of exact sums (oracle-stable across engines).
  */
object Frequency {

  /** Per-household exposure count + projfact, the reference's
    * `expo_freq` inner aggregation (hh_freq.py:24-30). If `dedupCol`
    * is set, rows are first deduped per (household, dedupCol) — the
    * reference's `get_one_freq` (hh_freq.py:33-39). */
  def householdFrequency(df: DataFrame, dedupCol: Option[String]): DataFrame = {
    val base = dedupCol match {
      case Some(d) => df.dropDuplicates("household_id", d)
      case None => df
    }
    base
      .groupBy("household_id")
      .agg(
        count(col("projfact")).as("frequency"),
        max(col("projfact")).as("projfact"))
  }

  /** Full frequency distribution: (frequency, proj_hh, pct_hh).
    * Mirrors the `freq_dec` decorator body (hh_freq.py:11-21). */
  def freqDistribution(df: DataFrame, dedupCol: Option[String]): DataFrame = {
    val hh = householdFrequency(df, dedupCol)
    val capped = hh.withColumn(
      "frequency",
      when(col("frequency") >= 10, lit(10L)).otherwise(col("frequency")))
    val grouped = capped
      .groupBy("frequency")
      .agg(sum(col("projfact")).as("proj_hh_raw"))
    grouped
      .withColumn(
        "pct_hh",
        col("proj_hh_raw") /
          sum(col("proj_hh_raw")).over(org.apache.spark.sql.expressions.Window
            .partitionBy()))
      .withColumn("proj_hh", round(col("proj_hh_raw")).cast("long"))
      .select(col("frequency"), col("proj_hh"), col("pct_hh"))
      .orderBy(col("frequency"))
  }
}
