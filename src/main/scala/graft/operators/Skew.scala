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

  /** Count-Min sketch geometry (Cormode & Muthukrishnan '05): depth
    * (independent hash rows), width (counters per row), the universal
    * hash family h_i(x) = ((a_i·(x mod p) + b_i) mod p) mod width over
    * the Mersenne prime p = 2³¹−1. Fixed LITERALS (never derived from
    * the corpus — the round-13 JIT-cliff rule, and the oracle
    * interpolates them), multipliers < 2³¹ so a_i·(x mod p) stays
    * inside a signed 64-bit long. */
  val CmsDepth: Int = 4
  val CmsWidth: Int = 512
  val CmsPrime: Long = 2147483647L
  val CmsA: Seq[Long] = Seq(1103515245L, 1299709L, 15485863L, 32452843L)
  val CmsB: Seq[Long] = Seq(12345L, 7919L, 104729L, 1299721L)

  /** The d hash-bucket expressions for one key column. */
  private def cmsBuckets(key: Column): Seq[Column] =
    (0 until CmsDepth).map { i =>
      pmod(lit(CmsA(i)) * pmod(key, lit(CmsPrime)) + lit(CmsB(i)),
        lit(CmsPrime)) % CmsWidth
    }

  /** Count-Min frequency estimates for the `topN` heaviest keys — the
    * THIRD frequency-sketch regime next to the exact detector
    * ([[skewReport]], one shuffle row per distinct key) and Misra–Gries
    * ([[skewReportApprox]], O(k) state, lower bounds, merge-order
    * noise): d·w = 2048 counters total, upper-bound estimates
    * (est ≥ true ALWAYS — the sketch only ever over-counts via
    * collisions), and — unlike MG or HLL — every counter is a plain
    * commutative SUM, so the estimate is bit-identical under any task
    * split or merge order. That makes this the one sketch the DuckDB
    * oracle replays bucket-for-bucket: `q_cms_freq` is HASH-gated, not
    * rows-only.
    *
    * Shape: the sketch is Spark's own aggregation engine — a d-way
    * posexplode then groupBy (row, bucket), so map-side combine
    * collapses every task's fan-out to ≤ d·w partial rows and the
    * shuffle carries ≤ d·w rows TOTAL at any corpus size (the
    * fixed-state promise, without a custom aggregate); the probe side
    * joins the top-key frame's d hash positions against those 2048
    * rows and takes min per key. The exact top-N frame this reports on
    * is [[skewReport]]'s own aggregate, so the report doubles as the
    * overcount audit (`over_rows` = collision mass on each hot key). */
  def cmsFreqReport(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val total = df.agg(count(lit(1)).as("n_total"))
    val top = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(topN)
    cmsProbe(cmsSketch(df, keyCol), top, keyCol)
      .crossJoin(broadcast(total))
      .select(col(keyCol), col("n_rows"), col("est_rows"),
        (col("est_rows") - col("n_rows")).as("over_rows"), col("n_total"))
      .orderBy(col("n_rows").desc, col(keyCol))
  }

  /** The bare counter grid: (row_i, bucket, cnt), ≤ d·w rows. Also the
    * STREAMING twin's whole plan ([[graft.streaming.EventStream
    * .cmsSketchStream]] delegates here): under complete-mode streaming
    * the grid IS the state — bounded at d·w counters however long the
    * stream runs, and because micro-batches fold in by the same
    * commutative sums as the batch plan's map-side partials, the
    * streamed grid equals the batch grid over the same rows
    * bit-for-bit (StreamingSpec pins it). */
  def cmsSketch(df: DataFrame, keyCol: String): DataFrame =
    df.select(posexplode(array(cmsBuckets(col(keyCol)): _*))
        .as(Seq("row_i", "bucket")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Catalog table name for the published CMS grid. */
  val CmsTable: String = "graft_cms_sketch"

  /** Publish the [[cmsSketch]] grid as a catalog parquet table — ONE
    * corpus scan, a ≤ d·w-row write (the sketch is dimension-sized
    * however large the corpus), after which any number of
    * [[servedCmsProbe]] calls answer frequency lookups with zero
    * corpus work. The frequency-sketch leg of the publish-and-serve
    * surface next to [[AnnIndex.publish]] and the dedup index; the
    * published grid is also exactly what a streamed
    * [[graft.streaming.EventStream.cmsSketchStream]] holds, so batch
    * publish and stream state are interchangeable serving sources. */
  def publishCms(df: DataFrame, keyCol: String,
                 table: String = CmsTable): Unit =
    graft.sources.Sources.publishTable(cmsSketch(df, keyCol), table)

  /** Serve estimates from the PUBLISHED grid — delegates to the same
    * [[cmsProbe]] the fresh path runs, so served == fresh by
    * construction (SketchGatesSpec proves the round trip
    * bit-for-bit). */
  def servedCmsProbe(spark: org.apache.spark.sql.SparkSession,
                     keys: DataFrame, keyCol: String,
                     table: String = CmsTable): DataFrame =
    cmsProbe(spark.table(table), keys, keyCol)

  /** Serve frequency estimates for `keys` (any frame carrying
    * `keyCol`, extra columns ride along) from a built [[cmsSketch]]
    * grid: d probe rows per key against the ≤ d·w-row grid, min over
    * the depth; a bucket the stream never touched reads 0. */
  def cmsProbe(sketch: DataFrame, keys: DataFrame,
               keyCol: String): DataFrame = {
    val carried = keys.columns.filterNot(_ == keyCol).map(col)
    keys.select(col(keyCol) +: carried :+
        posexplode(array(cmsBuckets(col(keyCol)): _*))
          .as(Seq("row_i", "bucket")): _*)
      .join(broadcast(sketch), Seq("row_i", "bucket"), "left_outer")
      .groupBy(col(keyCol) +: carried: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_rows"))
  }
}
