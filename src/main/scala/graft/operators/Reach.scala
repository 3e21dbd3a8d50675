package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reach counting: projection-weighted household counts per dimension
  * value with a `unique` flag (household touched exactly one value of
  * the dimension).
  *
  * Semantics: /root/reference/metrics/lib/hh_reach.py:7-45
  * (`add_uniq_col` + `reach_count`).
  *
  * Spark-first notes: the reference computes the per-household row
  * count with a groupBy + re-join (two shuffles on the same key); here
  * a single window `count over (partition by household)` does it in
  * one shuffle, and the whole result stays a distributed DataFrame
  * (no `toPandas`). At 100 TB the only wide exchanges are the
  * hash-partition on `household_id` (natural key of the fact table)
  * and the final small groupBy on the dimension values.
  */
object Reach {

  /** Distinct (cntCol, dim) pairs plus `unique` = 1.0 if the cntCol
    * entity has exactly one distinct dim value, else 0.0.
    * Mirrors hh_reach.add_uniq_col (hh_reach.py:7-13). */
  def addUniqCol(df: DataFrame, cntCol: String, dim: String): DataFrame = {
    val dd = df.na.drop(Seq(dim)).dropDuplicates(cntCol, dim)
    val w = Window.partitionBy(cntCol)
    dd.withColumn(
      "unique",
      when(count(lit(1)).over(w) > 1, lit(0.0)).otherwise(lit(1.0)))
  }

  /** Projection-weighted reach per dimension value:
    * (dimension, value, count, unique, duplicates) ordered by count
    * desc. `dim=None` in the reference becomes `dimOpt=None`: a single
    * overall row with value ''. Mirrors hh_reach.reach_count
    * (hh_reach.py:16-45). */
  def reachCount(
      df: DataFrame,
      cntCol: String,
      dimOpt: Option[String],
      projOpt: Option[String]): DataFrame = {
    val (proj, df0) = projOpt match {
      case Some(p) => (p, df)
      case None => ("projfact", df.withColumn("projfact", lit(1.0)))
    }
    val (dim, df1) = dimOpt match {
      case Some(d) => (d, df0.na.drop(Seq(d)))
      case None => ("all", df0.withColumn("all", lit("")))
    }
    val uniq = addUniqCol(df1, cntCol, dim)
    uniq
      .groupBy(col(dim))
      .agg(
        round(sum(col(proj))).as("count"),
        round(sum(col("unique") * col(proj))).as("unique"))
      .withColumn("duplicates", col("count") - col("unique"))
      .select(
        lit(dim).as("dimension"),
        col(dim).cast("string").as("value"),
        col("count"),
        col("unique"),
        col("duplicates"))
      .orderBy(desc("count"), asc("value"))
  }

  /** Multi-dimension reach table: one reach frame per dimension,
    * unioned. The reference assembles this with a driver-side pandas
    * append loop over dimensions (hh_reach.py:48-61 + main:68-85);
    * here it is a single distributed union plan — every dimension's
    * aggregation runs concurrently and nothing collects. */
  def reachByDimensions(df: DataFrame, cntCol: String, dims: Seq[String],
                        proj: Option[String]): DataFrame =
    dims.map(d => reachCount(df, cntCol, Some(d), proj))
      .reduce(_.unionAll(_))
      .orderBy(asc("dimension"), desc("count"), asc("value"))
}
