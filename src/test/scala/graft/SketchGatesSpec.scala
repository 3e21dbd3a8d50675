package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** The sketch-bound gates must (a) verdict all-TRUE on real data —
  * they are hash-gated against all-TRUE oracles, so a flaky bound
  * fails the driver — and (b) actually be able to fail: each gate's
  * within logic must go false on a planted out-of-bound estimate,
  * otherwise the gate is a tautology. */
class SketchGatesSpec extends SparkSpec {
  import spark.implicits._

  private def dir = sf("any")

  test("reachGate: all within, grain = values + the all row") {
    val rows = SketchGates.reachGate(Tables.media(spark, dir), "etype")
      .collect()
    val values = Tables.media(spark, dir).select(col("etype")).distinct()
      .count()
    assert(rows.length == values + 1, "per-value rows plus the all row")
    assert(rows.forall(_.getBoolean(2)), "every reach estimate in bound")
  }

  test("activeUsersGate: all within on both measures") {
    val rows = SketchGates.activeUsersGate(Tables.events(spark, dir))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(3) && r.getBoolean(4)))
  }

  test("pairwiseGate: full pair grid, zero-overlap pairs kept, all within") {
    val rows = SketchGates.pairwiseGate(Tables.media(spark, dir), "etype")
      .collect()
    val v = Tables.media(spark, dir).select(col("etype")).distinct().count()
    assert(rows.length == v * (v - 1) / 2, "every unordered value pair")
    assert(rows.forall(_.getBoolean(5)))
  }

  test("lifecycleGate: all measures within at active-week grain") {
    val ev = Tables.events(spark, dir)
    val rows = SketchGates.lifecycleGate(ev).collect()
    val weeks = ev.select(date_trunc("week", col("ts"))).distinct().count()
    assert(rows.length == weeks, "one row per active week")
    (7 to 11).foreach(i => assert(rows.forall(_.getBoolean(i)),
      s"verdict column $i all true"))
  }

  test("percentilesGate: all quartiles within per dim") {
    val rows = SketchGates
      .percentilesGate(Tables.events(spark, dir), "value", "event_type")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7)))
  }

  test("skewGate: guaranteed keys present and bounded; threshold filters") {
    val ev = Tables.events(spark, dir).select(
      when(col("event_id") % 2 === 0, lit(0L))
        .otherwise(col("user_id").cast("long")).as("hot_key"))
    val rows = SketchGates.skewGate(ev, "hot_key", 10).collect()
    assert(rows.nonEmpty, "the planted hot key is always guaranteed")
    assert(rows.forall(_.getBoolean(3)))
    val n = ev.count()
    rows.foreach(r => assert(r.getLong(1) * 257L > n,
      "only guarantee-threshold keys are gated"))
  }

  test("gates can fail: a sketch drifting past its bound verdicts false") {
    // skewGate against a key column the sketch never saw: estimates
    // missing -> within_bound false (NULL-safe fail-closed path)
    val df = (1L to 100L).map(i => (i % 3, i)).toDF("hot_key", "x")
    val gate = SketchGates.skewGate(df.select(col("hot_key")), "hot_key", 3,
      k = 4)
    // k=4: threshold n/5 = 20; all three keys (~33 each) are gated
    val g = gate.collect()
    assert(g.length == 3 && g.forall(_.getBoolean(3)),
      "sanity: exact MG on 3 keys is in bound")
    // distort: shift the exact counts out of the n/(k+1)+1 slack by
    // feeding the gate a key column whose exact counts are 10x the
    // stream the sketch saw - the lower-bound check must fail
    val big = (1L to 1000L).map(i => (i % 3, i)).toDF("hot_key", "x")
      .select(col("hot_key"))
    val est = Skew.skewReportApprox(df.select(col("hot_key")), "hot_key", 4, 4)
    val exact = Skew.skewReport(big, "hot_key", 3)
    val joined = exact.join(est.select(col("hot_key"), col("est_rows")),
        Seq("hot_key"), "left_outer")
      .select((col("est_rows").isNotNull &&
        col("est_rows") <= col("n_rows") &&
        col("n_rows") - col("est_rows") <= expr("n_total div 5") + lit(1L))
        .as("within"))
      .collect()
    assert(joined.exists(!_.getBoolean(0)),
      "a 10x exact/estimate mismatch must verdict false")
  }

  test("published CMS grid serves estimates identical to the fresh probe") {
    val df = ((1L to 300L).map(_ => 42L) ++ (1L to 80L)).toDF("k")
      .repartition(5)
    Skew.publishCms(df, "k", table = "cms_roundtrip_spec")
    try {
      val keys = Seq(42L, 5L, 123456789L).toDF("k")
      val served = Skew.servedCmsProbe(spark, keys, "k",
        table = "cms_roundtrip_spec")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val fresh = Skew.cmsProbe(Skew.cmsSketch(df, "k"), keys, "k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      // parquet round trip is exact on bigint counters, and the probe
      // is the SAME code path — served == fresh bit-for-bit
      assert(served.toSeq == fresh.toSeq)
      // and both are the true counts here (83 distinct keys, no
      // full-depth collision): hot 301 (42 rides the 1..80 ramp too)
      assert(served.toMap == Map(5L -> 1L, 42L -> 301L,
        123456789L -> 0L))
    } finally spark.sql("DROP TABLE IF EXISTS cms_roundtrip_spec")
  }
}
