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

  /** Skew detector — the diagnostic that says WHETHER [[saltedSum]] /
    * AQE skew handling is needed on a key column before a 100 TB job
    * discovers it the hard way: the `topN` heaviest key values with
    * row counts and share of the table. Runs as one map-side-combine
    * hash aggregate (partial counts collapse hot keys per partition,
    * so the shuffle carries ≤ distinct-keys rows), the table total as
    * a broadcast 1-row frame (never a window over the corpus-sized
    * key-count frame), and a TakeOrderedAndProject top-N (per-partition
    * heaps, no global sort). A share near 1/shuffle-partitions on
    * rank 1 means a straggler reducer; near 1.0 means a degenerate
    * key (the planted q_skew_report hot key holds ~half the table). */
  def skewReport(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val total = df.agg(count(lit(1)).as("n_total"))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(total))
      .withColumn("share", col("n_rows").cast("double") / col("n_total"))
      .select(col(keyCol), col("n_rows"), col("n_total"), col("share"))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(topN)
  }

  /** Sketch twin of [[skewReport]]: Misra–Gries heavy hitters via the
    * custom `graft_heavy_agg` Catalyst aggregate. The exact detector's
    * shuffle carries one row per DISTINCT key — fine for household
    * ids, pathological when the key is near-unique (URLs, session
    * ids: the diagnostic becomes as expensive as the problem). Here
    * every task keeps at most k counters, partials merge by the
    * mergeable-summaries rule, and ONE k-entry summary reaches the
    * driver side of the plan — state is O(k) at any corpus size.
    * Estimates are lower bounds within n/(k+1) of the true count
    * (every key above that threshold is guaranteed present), so run
    * it with k ≫ the top-N of interest. Merge order perturbs
    * estimates (not the guarantee), hence rows-only at the gate with
    * SkewSpec bounding it against [[skewReport]] — the same contract
    * as the HLL/KLL sketch twins. */
  /** Misra–Gries summary size — shared by [[skewReportApprox]] and
    * [[SketchGates.skewGate]], and interpolated into the
    * q_skew_report_gate oracle's guarantee threshold (n/(k+1)),
    * PureProps-pinned. */
  val MgSummaryK: Int = 256

  def skewReportApprox(df: DataFrame, keyCol: String, topN: Int,
                       k: Int = MgSummaryK): DataFrame = {
    val agg = df.agg(
      count(lit(1)).as("n_total"),
      call_function("graft_heavy_agg", col(keyCol), lit(k)).as("hh"))
    agg.select(col("n_total"), explode(col("hh")).as("e"))
      .select(col("e.key").as(keyCol), col("e.est").as("est_rows"),
        col("n_total"),
        (col("e.est").cast("double") / col("n_total")).as("min_share"))
      .orderBy(col("est_rows").desc, col(keyCol))
      .limit(topN)
  }
}
