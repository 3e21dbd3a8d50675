package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-QA grouping diff: group a log table and an ad-server table by
  * the same dimensions, outer-join the grouped counts, and emit
  * difference / percent-difference columns; plus the meta aggregation
  * (sorted-unique string agg of meta columns per dimension value).
  *
  * Semantics: /root/reference/dataQA/dailyQAHelpers.py:75-90
  * (`join_dfs`: sum(exe_imp) vs sum(impressions), outer merge, diff,
  * pct_diff) and dailyQAHelpers.py:160-171 (`agg_to_list_str` +
  * `make_meta`: distinct meta values joined as one sorted
  * space-separated string).
  *
  * Spark-first notes: the reference round-trips every grouping through
  * pandas (`pd.read_sql`) and merges driver-side; here both sides are
  * grouped DataFrames joined on the dimension key — the join inputs
  * are already aggregated (small), so Spark picks a broadcast or
  * small-shuffle join and the whole QA table never leaves the
  * executors. The meta agg uses `sort_array(collect_set(...))` which
  * is deterministic (unlike relying on arrival order).
  */
object DailyQA {

  /** Outer-join grouped counts of `log` (count → exe_imp) and `ad`
    * (count → impressions) on `dims`, with diff and pct_diff. */
  def groupingDiff(log: DataFrame, ad: DataFrame, dims: Seq[String]): DataFrame = {
    val cols = dims.map(col)
    val logG = log.groupBy(cols: _*).agg(count(lit(1)).as("exe_imp"))
    val adG = ad.groupBy(cols: _*).agg(count(lit(1)).as("impressions"))
    logG
      .join(adG, dims, "full_outer")
      .withColumn("diff", col("impressions") - col("exe_imp"))
      // nullif: impressions can be 0 when the grouped ad side carries
      // an explicit zero (e.g. sum over an all-zero group) — NULL in
      // both engines instead of Spark-NULL vs DuckDB-inf
      .withColumn("pct_diff",
        col("diff").cast("double") / nullif(col("impressions"), lit(0)))
      .orderBy(cols: _*)
  }

  /** Hour-shifted daily counts over the trailing period: timestamps
    * shifted by `hours` (the reference's ad-server timezone fixup),
    * truncated to dates, filtered to the last `periodDays` days
    * relative to the max date, counted per day. Mirrors
    * dailyQAHelpers.shift_hours (dailyQAHelpers.py:44-58) + the
    * min_max_dt trailing window (dailyQA.py:43-50). The max-date bound
    * stays a broadcast single-row frame — no driver collect. */
  def shiftedDailyCounts(df: DataFrame, tsCol: String, hours: Int,
                         periodDays: Int): DataFrame = {
    val shifted = df.select(
      to_date(col(tsCol) + expr(s"INTERVAL $hours HOURS")).as("date"))
    val bounds = shifted.groupBy().agg(max(col("date")).as("max_d"))
    shifted
      .crossJoin(broadcast(bounds))
      .where(datediff(col("max_d"), col("date")) < periodDays)
      .groupBy(col("date"))
      .agg(count(lit(1)).as("exe_imp"))
      .orderBy(col("date"))
  }

  /** Per-dimension sorted-unique space-joined meta string. */
  def metaAgg(df: DataFrame, dim: String, metaCol: String): DataFrame =
    df.groupBy(col(dim))
      .agg(array_join(sort_array(collect_set(col(metaCol).cast("string"))), " ")
        .as("meta"))
      .orderBy(col(dim))
}
