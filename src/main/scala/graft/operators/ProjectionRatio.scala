package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Projection ratio per media type + overall: the ratio of universe
  * exposures to the projection-weighted exposures of matched
  * households, per media type and for the union of all types.
  *
  * Semantics: /root/reference/metrics/lib/hh_project_univ.py:6-26
  * (`get_ratio`, `get_total_ratio`, `main`) — there, each media type
  * has a universe table carrying `exposures` and the ratio is
  * `sum(exposures) / sum(projfact)` over the projection-joined
  * exposure rows; the 'all' row is the same over the unioned lists.
  *
  * Spark-first notes: the reference issues two scalar `collect()`s per
  * media type plus two for the overall row (2·N+2 Spark jobs). Both
  * sums group by the same key, so here it is ONE grouped aggregation
  * (`count(*)` standing in for the universe's exposure sum, per
  * SURVEY.md §3's self-contained mapping) plus a rollup union for the
  * 'all' row — a single job whose only exchange is the tiny per-type
  * hash aggregate.
  */
object ProjectionRatio {

  /** (etype, ratio) for every media type plus an 'all' row. */
  def projectionRatios(exposure: DataFrame): DataFrame = {
    val perType = exposure
      .groupBy(col("etype"))
      .agg(
        count(lit(1)).cast("double").as("exposures"),
        sum(col("projfact")).as("proj_num"))
    val withAll = perType.unionAll(
      perType.groupBy().agg(
        sum(col("exposures")).as("exposures"),
        sum(col("proj_num")).as("proj_num"))
        .select(lit("all").as("etype"), col("exposures"), col("proj_num")))
    withAll
      .select(col("etype"), (col("exposures") / col("proj_num")).as("ratio"))
      .orderBy(col("etype"))
  }
}
