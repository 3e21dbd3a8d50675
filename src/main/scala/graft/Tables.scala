package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders over the driver-generated parquet testdata, plus the
  * derived "media" view that maps the generic `events` table onto the
  * reference's exposure-log schema (see SURVEY.md §3; reference schema
  * usage: /root/reference/metrics/helpers/make_media.py:27-46).
  *
  * `projfact` is a deterministic synthetic projection factor
  * (`1 + user_id % 7`, integer-valued double) so that all
  * projection-weighted sums are exact in IEEE double and identical in
  * the DuckDB oracles regardless of summation order.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `events.ts` is parquet timestamp[ns], which Spark only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * [[GraftSession]]). Convert the raw nanos to a microsecond
    * timestamp with integer division (ns since epoch exceeds 2^53, so
    * double division would lose precision). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Exposure-log view of `events` in the reference's media schema:
    * household_id, etype, date, week, projfact (+ passthrough cols).
    * Column pruning still reaches the scan because this is a pure
    * projection. */
  def media(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("user_id").as("household_id"),
      col("event_type").as("etype"),
      to_date(col("ts")).as("date"),
      date_trunc("week", col("ts")).cast("date").as("week"),
      (lit(1.0) + (col("user_id") % 7).cast("double")).as("projfact"),
      col("value"),
      col("ts"),
      col("event_id"))
}
