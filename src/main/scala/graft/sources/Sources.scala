package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink surface of the engine. The reference reads Hive tables
  * and Redshift via SQL (dataQA/dailyConnection.py, tasks' hc.table)
  * and writes Hive tables + csv exports
  * (metrics/helpers/pdf_to_table_excel.py). The Spark-native analog:
  * columnar parquet as the primary format, csv/json for interchange,
  * and hive-style partitioned writes so downstream scans prune on the
  * partition key.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Hive-style partitioned parquet write. At 100 TB the partition
    * column is the pruning key (e.g. date) — readers with a filter on
    * it scan only matching directories. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
