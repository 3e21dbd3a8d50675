package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Structural failure of a QA input — the engine's analog of the
  * reference's DataException
  * (/root/reference/dataQA/dataExceptions.py:4-16): raised when a
  * table is missing required columns or the timestamp column has the
  * wrong type, i.e. when running the QA would produce garbage rather
  * than a diff.
  */
class GraftDataException(msg: String) extends RuntimeException(msg)

/** Schema preflight + threshold-exceedance flagging for QA tables.
  *
  * Semantics: /root/reference/dataQA/dailyQA.py:131-147 (`check_cols`
  * raises DataException for missing date/impressions/timestamp
  * columns) and dailyQAHelpers.py:31-41 (`check_timestamp` validates
  * the column type). The reference surfaces bad rows by writing the
  * error out for a human (dataExceptions.write_out); the Spark-native
  * form is [[flagExceedances]] — a distributed filter producing the
  * offending rows themselves, which scales to any QA table size and
  * can feed an alerting sink directly.
  */
object DataChecks {

  /** Preflight: every `required` column must exist, else a
    * [[GraftDataException]] naming the missing ones (analysis-time,
    * before any job runs). */
  def requireColumns(df: DataFrame, required: Seq[String], context: String): Unit = {
    val have = df.columns.toSet
    val missing = required.filterNot(have)
    if (missing.nonEmpty)
      throw new GraftDataException(
        s"$context: missing required column(s) ${missing.mkString(", ")}; " +
          s"present: ${df.columns.mkString(", ")}")
  }

  /** Preflight: `column` must be a timestamp or date (the reference's
    * check_timestamp, raised when an hour shift is requested on a
    * non-timestamp column). */
  def requireTimeColumn(df: DataFrame, column: String, context: String): Unit = {
    requireColumns(df, Seq(column), context)
    df.schema(column).dataType match {
      case TimestampType | DateType => ()
      case other =>
        throw new GraftDataException(
          s"$context: column $column must be timestamp/date, is ${other.simpleString}")
    }
  }

  /** The reference's dataExceptions.write_out
    * (/root/reference/dataQA/dataExceptions.py:18-23): when QA cannot
    * run, the output artifact is a one-line error file rather than
    * nothing — downstream consumers see WHY there is no table instead
    * of a missing path. */
  def writeErrorOut(spark: org.apache.spark.sql.SparkSession,
                    message: String, path: String): Unit = {
    import spark.implicits._
    Seq(message).toDF("error")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Rows of a QA diff table whose |pct_diff| exceeds `tolerance`,
    * with the exceedance magnitude and the applied tolerance attached.
    * NULL pct_diff (no ad-side rows) never flags — absence is a
    * different failure than divergence. */
  def flagExceedances(qa: DataFrame, tolerance: Double): DataFrame = {
    requireColumns(qa, Seq("pct_diff"), "flagExceedances")
    qa.where(abs(col("pct_diff")) > tolerance)
      .withColumn("abs_pct_diff", abs(col("pct_diff")))
      .withColumn("tolerance", lit(tolerance))
  }

  /** Single-pass column profile (the describe-table QA step): one row
    * per profiled column with exact row/null/distinct counts, numeric
    * min/max/mean (mean rounded to 2 — the partial sums of a
    * distributed avg are order-dependent in the last bits) and string
    * min/max. ONE aggregation over the table: Spark plans the mixed
    * distinct aggregates as a single Expand+Aggregate scan (rows
    * duplicated once per distinct column — the standard multi-distinct
    * shape), never one job per column; the long format comes from
    * exploding the single result row, which is free. Exact distinct is
    * a deliberate choice over approx_count_distinct: profiles feed QA
    * gates, and an HLL estimate that drifts between runs would flag
    * phantom changes. */
  def profile(df: DataFrame, numCols: Seq[String],
              strCols: Seq[String]): DataFrame = {
    requireColumns(df, numCols ++ strCols, "profile")
    val aggs =
      numCols.flatMap(c => Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"),
        round(avg(col(c)), 2).as(s"mean_$c"))) ++
      strCols.flatMap(c => Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"smin_$c"),
        max(col(c)).cast("string").as(s"smax_$c")))
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val entries =
      numCols.map(c => struct(
        lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        col(s"min_$c").as("min_num"), col(s"max_$c").as("max_num"),
        col(s"mean_$c").as("mean"),
        nullS.as("min_str"), nullS.as("max_str"))) ++
      strCols.map(c => struct(
        lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        nullD.as("min_num"), nullD.as("max_num"), nullD.as("mean"),
        col(s"smin_$c").as("min_str"), col(s"smax_$c").as("max_str")))
    row.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }
}
