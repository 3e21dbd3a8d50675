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

  /** Delete-a-group jackknife variance of the projection-weighted
    * overall reach (DAGJK, the standard replicate-variance estimator
    * of survey measurement): households are split into `groups`
    * deterministic replicate groups (numeric key mod G — rerun- and
    * engine-stable, unlike rand(); hash string keys to a bucket
    * first), each replicate estimate θ₍g₎ = G/(G−1) · (T − s_g)
    * re-scales the total with group g deleted, and
    * v = (G−1)/G · Σ (θ₍g₎ − T)². A reach number without an error bar
    * is not measurement-grade; this emits the variance next to the
    * estimate (standard error needs a sqrt, which is not bit-portable
    * across engines — take it client-side).
    *
    * Scale shape: one household aggregate (map-side combine) is the
    * only full-data exchange; everything after runs on the G-row
    * replicate frame, including a spine join so EMPTY groups still
    * contribute their θ₍g₎ = G/(G−1)·T replicate. The deviation
    * squares fold in sorted group order, so the float summation is
    * engine-independent and the DuckDB oracle matches bit-for-bit. */
  def reachVariance(df: DataFrame, cntCol: String, proj: String,
                    groups: Int = 10): DataFrame = {
    require(groups > 1, s"need at least 2 replicate groups, got $groups")
    val hh = df.na.drop(Seq(cntCol))
      .groupBy(col(cntCol)).agg(max(col(proj)).as("w"))
      .withColumn("g", pmod(col(cntCol), lit(groups)))
    val spine = df.sparkSession.range(1).select(
      explode(sequence(lit(0), lit(groups - 1))).as("g"))
    val perG = spine.join(
      // count(w), not count(*): a household whose every projfact is
      // NULL has w NULL and contributes nothing to any replicate sum —
      // counting it would report n_households the estimator never saw
      // (and diverge from the oracle's count(xg.w))
      hh.groupBy(col("g")).agg(sum(col("w")).as("s_g"),
        count(col("w")).as("n_g")),
      Seq("g"), "left_outer")
      .na.fill(0.0, Seq("s_g")).na.fill(0L, Seq("n_g"))
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val scale = lit(groups.toDouble / (groups - 1.0))
    val est = perG
      .withColumn("total", sum(col("s_g")).over(all))
      .withColumn("n_households", sum(col("n_g")).over(all))
      .withColumn("dev", (col("total") - col("s_g")) * scale - col("total"))
    est
      .agg(first(col("total")).as("reach"),
        first(col("n_households")).as("n_households"),
        sort_array(collect_list(struct(col("g"), col("dev")))).as("devs"))
      .select(col("reach"), col("n_households"),
        lit(groups).as("groups"),
        (aggregate(col("devs"), lit(0.0),
          (acc, x) => acc + x.getField("dev") * x.getField("dev")) *
          lit((groups - 1.0) / groups)).as("jk_variance"))
  }

  /** [[reachVariance]] per dimension value: the by-segment reach table
    * WITH its error bars — the artifact a measurement client actually
    * consumes ("reach of sports was 1.2M ± 40k"). Same DAGJK
    * estimator, one more key: replicate sums are per (value, group),
    * the spine join gives every value all G replicates (an empty
    * replicate still contributes), the windows and the sorted
    * deviation folds are value-partitioned. One (value, household)
    * dedup aggregate is the only full-data exchange; everything after
    * is values × G rows. */
  def reachVarianceByDim(df: DataFrame, cntCol: String, dim: String,
                         proj: String, groups: Int = 10): DataFrame = {
    require(groups > 1, s"need at least 2 replicate groups, got $groups")
    val hv = df.na.drop(Seq(dim, cntCol))
      .groupBy(col(dim), col(cntCol)).agg(max(col(proj)).as("w"))
      .withColumn("g", pmod(col(cntCol), lit(groups)))
    val perG = hv.groupBy(col(dim), col("g")).agg(sum(col("w")).as("s_g"))
    val spine = perG.select(col(dim)).distinct()
      .select(col(dim), explode(sequence(lit(0), lit(groups - 1))).as("g"))
    val wv = Window.partitionBy(col(dim)).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val scale = lit(groups.toDouble / (groups - 1.0))
    spine.join(perG, Seq(dim, "g"), "left_outer")
      .na.fill(0.0, Seq("s_g"))
      .withColumn("total", sum(col("s_g")).over(wv))
      .withColumn("dev", (col("total") - col("s_g")) * scale - col("total"))
      .groupBy(col(dim))
      .agg(first(col("total")).as("reach"),
        sort_array(collect_list(struct(col("g"), col("dev")))).as("devs"))
      .select(col(dim), col("reach"), lit(groups).as("groups"),
        (aggregate(col("devs"), lit(0.0),
          (acc, x) => acc + x.getField("dev") * x.getField("dev")) *
          lit((groups - 1.0) / groups)).as("jk_variance"))
      .orderBy(col(dim))
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

  /** Hierarchical exposure totals in ONE pass: exposures, projected
    * sum and exact distinct-household reach at every prefix level of
    * `dims` (full detail → per-dim1 → grand total) via ROLLUP. The
    * reference computes each level as its own job over the fact table
    * (hh_reach.py main's per-dim loop plus a separate overall run);
    * ROLLUP's Expand emits levels+1 copies of each row into a single
    * hash aggregate — one shuffle for the whole hierarchy, with
    * `lvl` = grouping_id() labeling the level and NULL group keys
    * coalesced to 'all'. The countDistinct adds the standard two-phase
    * distinct expansion; both stay map-side-partial. */
  def reachRollup(media: DataFrame, dims: Seq[String],
                  proj: String): DataFrame = {
    val dcols = dims.map(col)
    media
      .rollup(dcols: _*)
      .agg(count(lit(1)).as("exposures"),
        round(sum(col(proj))).as("proj_sum"),
        countDistinct(col("household_id")).as("households"),
        grouping_id().cast("int").as("lvl"))
      .select(dims.map(d => coalesce(col(d).cast("string"), lit("all")).as(d)) ++
        Seq(col("exposures"), col("proj_sum"), col("households"), col("lvl")): _*)
      .orderBy(col("lvl") +: dcols: _*)
  }

  /** Approximate distinct reach per dimension value + overall, via
    * HyperLogLog SKETCHES (not just approx_count_distinct): one
    * sketch-aggregate per dimension value, then the overall row MERGES
    * the per-value sketches (hll_union_agg) instead of rescanning the
    * fact table. This is the genuine 100 TB reach path — an exact
    * countDistinct shuffles every distinct (value, household) pair,
    * while a sketch is a fixed ~KB state with map-side combine; the
    * mergeability is what makes incremental / cross-partition reach
    * roll-ups cheap. No DuckDB oracle (sketch internals are
    * engine-specific — rows-only gate); ReachSpec bounds the estimate
    * against the exact count instead (lgK=12 → ~1.6% rsd). */
  def approxReach(media: DataFrame, dim: String): DataFrame = {
    val perValue = media
      .groupBy(col(dim).cast("string").as("value"))
      .agg(hll_sketch_agg(col("household_id"), lit(12)).as("sk"))
    perValue
      .select(col("value"), hll_sketch_estimate(col("sk")).as("reach_est"))
      .unionAll(perValue.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("reach_est"))
        .select(lit("all").as("value"), col("reach_est")))
      .orderBy(desc("reach_est"), asc("value"))
  }
}
