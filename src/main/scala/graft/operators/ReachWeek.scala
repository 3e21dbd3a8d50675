package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weekly incremental reach: projection-weighted count of households
  * seen for the first time in each week, plus the cumulative sum.
  *
  * Semantics: /root/reference/metrics/lib/hh_reach_week.py:6-27
  * (`make_weekly`).
  *
  * Spark-first notes: the reference drives a Python loop over the
  * distinct weeks, launching one anti-join job per week (O(weeks)
  * passes over the cached dedup frame, each a `collect()` to the
  * driver). A household is "new in week w" iff w == min(week) over its
  * exposures, so the whole table is ONE plan: groupBy(household)
  * .min(week) → groupBy(week).sum(projfact) → cumulative window over
  * the tiny per-week frame. Same numbers, one shuffle on household_id
  * and one on week, no driver loop — the shape that survives 100 TB.
  */
object ReachWeek {
  def weeklyReach(df: DataFrame): DataFrame = {
    val firstWeek = df
      .groupBy(col("household_id"))
      .agg(min(col("week")).as("week"), max(col("projfact")).as("projfact"))
    val perWeek = firstWeek
      .groupBy(col("week"))
      .agg(round(sum(col("projfact"))).as("counts"))
    perWeek
      .withColumn(
        "cum_sum",
        sum(col("counts")).over(
          Window.partitionBy().orderBy(col("week"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("week"))
  }
}
