package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB keys. AQE's skew-join handling
  * covers joins; for aggregations whose key distribution is known to
  * be pathological (one household with millions of rows), two-phase
  * salted aggregation bounds any single task's input.
  */
object Skew {

  /** Two-phase salted sum: phase 1 aggregates on (key, salt) where
    * salt is a deterministic hash of salt-source columns mod
    * `saltBuckets` (no rand() — re-runs must reproduce), phase 2
    * combines the ≤saltBuckets partials per key. Result is identical
    * to a direct groupBy(key).sum but no reducer sees more than
    * 1/saltBuckets of a hot key's rows in phase 1. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltSource: Column, saltBuckets: Int): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", pmod(hash(saltSource), lit(saltBuckets)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }
}
