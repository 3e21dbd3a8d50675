package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Journey}

class JourneySpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

  test("cohortRetention buckets users by first week and divides by cohort size") {
    // u1 starts wk of Jan 1 and returns wk of Jan 8; u2 starts Jan 1
    // only; u3 starts Jan 8 only → cohort 1 has size 2 with 50%
    // week-1 retention, cohort 2 has size 1.
    val e = ev(
      (1L, "2024-01-02 10:00:00", "view"),
      (1L, "2024-01-09 10:00:00", "view"),
      (2L, "2024-01-03 10:00:00", "view"),
      (3L, "2024-01-10 10:00:00", "view"))
    val out = Journey.cohortRetention(e).collect()
    val byKey = out.map(r => (r.getDate(0).toString, r.getInt(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(byKey(("2024-01-01", 0)) == ((2L, 2L, 1.0)))
    assert(byKey(("2024-01-01", 1)) == ((1L, 2L, 0.5)))
    assert(byKey(("2024-01-08", 0)) == ((1L, 1L, 1.0)))
    assert(out.length == 3)
  }

  test("cohortRetention week_ix is calendar-correct across a gap") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-29 00:00:00", "view")) // 4 weeks later, gap between
    val out = Journey.cohortRetention(e).collect()
    assert(out.map(_.getInt(1)).sorted.toSeq == Seq(0, 4))
  }

  test("lifecycle classifies new/retained/resurrected/churned per week") {
    // u1 active wk0+wk1 (trailing churn lands wk2 = corpus max);
    // u2 active wk0+wk2 (gap churn at wk1, trailing churn past max
    // suppressed); u3 active wk0 only (churn at wk1). Multiple events
    // in one user-week must dedup before classification.
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-02 11:00:00", "view"),
      (1L, "2024-01-08 10:00:00", "view"),
      (2L, "2024-01-03 09:00:00", "view"),
      (2L, "2024-01-16 09:00:00", "view"),
      (3L, "2024-01-04 08:00:00", "view"))
    val out = Journey.lifecycle(e).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      ("2024-01-01", "new") -> 3L,
      ("2024-01-08", "retained") -> 1L,
      ("2024-01-08", "churned") -> 2L,
      ("2024-01-15", "resurrected") -> 1L,
      ("2024-01-15", "churned") -> 1L))
  }

  test("funnelLatency: per-step conversion latency quartiles") {
    // u1 converts view>click in 10s and click>purchase in 60s;
    // u2 converts view>click in 30s and never purchases
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:00:10", "click"),
      (1L, "2024-01-01 10:01:10", "purchase"),
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 09:00:30", "click"))
    val out = Journey.funnelLatency(e, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(out("view>click") == ((2L, 20.0, 15.0, 20.0, 25.0)))
    assert(out("click>purchase") == ((1L, 60.0, 60.0, 60.0, 60.0)))
  }

  test("nextEventMatrix counts adjacent transitions per user with probabilities") {
    val e = Seq(
      (1L, 10L, "2024-01-01 10:00:00", "view"),
      (1L, 11L, "2024-01-01 10:01:00", "click"),
      (1L, 12L, "2024-01-01 10:02:00", "view"),
      (2L, 20L, "2024-01-01 09:00:00", "view"),
      (2L, 21L, "2024-01-01 09:05:00", "view"))
      .toDF("user_id", "event_id", "tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = Journey.nextEventMatrix(e).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("view", "click")) == ((1L, 0.5)))
    assert(out(("view", "view")) == ((1L, 0.5)))
    assert(out(("click", "view")) == ((1L, 1.0)))
    assert(out.size == 3) // u2's last event has no successor
  }

  test("userFeatures assembles the per-user row in one pass") {
    val e = Seq(
      (1L, "2024-01-01 10:00:00", 10.0, "view"),
      (1L, "2024-01-01 10:00:30", 20.0, "click"),
      (1L, "2024-01-03 10:01:00", 30.0, "view"),
      (2L, "2024-01-03 09:00:00", 5.5, "purchase"))
      .toDF("user_id", "tss", "value", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = Journey.userFeatures(e, Seq("click", "purchase", "view"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = out(1L)
    assert(u1.getLong(1) == 3L && u1.getLong(2) == 2L) // events, days
    assert(u1.getInt(3) == 0)                          // recent on as-of day
    // (2 days + 60 s) / 2 gaps
    assert(u1.getDouble(4) == (2 * 86400.0 + 60.0) / 2)
    assert(u1.getDouble(5) == 60.0)                    // spend
    assert(u1.getLong(6) == 1L && u1.getLong(7) == 0L && u1.getLong(8) == 2L)
    val u2 = out(2L)
    assert(u2.isNullAt(4))                             // no cadence from 1 event
    assert(u2.getDouble(5) == 5.5 && u2.getLong(7) == 1L)
  }

  test("rfmSegments scores quartiles without a global sort") {
    val e = Seq(
      (1L, "2024-01-04 10:00:00", 40.0),
      (2L, "2024-01-03 10:00:00", 30.0),
      (3L, "2024-01-02 10:00:00", 20.0),
      (4L, "2024-01-01 10:00:00", 10.0))
      .toDF("user_id", "tss", "value")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = Journey.rfmSegments(e).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    // freq ties (all 1) share f-score 1; recency and monetary spread 1-4
    assert(out((1, 1, 4)) == ((1L, 40.0)))
    assert(out((2, 1, 3)) == ((1L, 30.0)))
    assert(out((3, 1, 2)) == ((1L, 20.0)))
    assert(out((4, 1, 1)) == ((1L, 10.0)))
  }

  test("funnelSteps only counts stages completed in order") {
    val e = ev(
      // u1 completes view → click → purchase in order
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-02 00:00:00", "click"),
      (1L, "2024-01-03 00:00:00", "purchase"),
      // u2 clicks BEFORE its first view — click never counts
      (2L, "2024-01-01 00:00:00", "click"),
      (2L, "2024-01-02 00:00:00", "view"),
      // u3 views then purchases with no click — stalls at stage 0
      (3L, "2024-01-01 00:00:00", "view"),
      (3L, "2024-01-02 00:00:00", "purchase"))
    val out = Journey.funnelSteps(e, Seq("view", "click", "purchase"))
      .collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((0, "view", 3L), (1, "click", 1L), (2, "purchase", 1L)))
    assert(out(0).isNullAt(3)) // first stage has no pct_prev
    assert(out(1).getDouble(3) == 1.0 / 3.0)
    assert(out(2).getDouble(4) == 1.0 / 3.0) // pct_first
  }

  test("funnelSteps same-instant completion counts (at-or-after)") {
    val e = ev(
      (1L, "2024-01-01 00:00:00", "view"),
      (1L, "2024-01-01 00:00:00", "click"))
    val out = Journey.funnelSteps(e, Seq("view", "click")).collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("propsHealth splits valid, missing-field and malformed payloads") {
    val e = Seq(
      ("a", """{"k": 5}"""), ("a", """{"k": 7}"""),
      ("a", """{"x": 1}"""), // valid JSON, no k
      ("b", "not json"),     // malformed
      ("b", """{"k": 2}"""))
      .toDF("event_type", "props")
    val out = Analytics.propsHealth(e).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 3 && out("a").getLong(2) == 2)
    assert(out("a").getLong(3) == 1) // n_invalid
    assert(out("a").getInt(4) == 5 && out("a").getInt(5) == 7)
    assert(out("a").getLong(6) == 12)
    assert(out("b").getLong(2) == 1 && out("b").getLong(3) == 1)
  }

  test("activeUsers counts each user once per trailing window") {
    // u1 active days 1 and 2 (counts once in any window holding both);
    // u2 active day 1 only; u3 active day 9 (outside day 1's window)
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "view"), // same user+day dedups
      (1L, "2024-01-02 10:00:00", "view"),
      (2L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-09 10:00:00", "view"))
    val out = Journey.activeUsers(e, 7).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("2024-01-01") == ((2L, 2L)))
    assert(out("2024-01-02") == ((1L, 2L)), "u1 counted once in the window")
    assert(out("2024-01-09") == ((1L, 1L)),
      "day-1 users aged out of the 7-day window")
    assert(out.size == 3, "only days with own-day activity emit")
  }

  test("approxActiveUsers tracks the exact DAU/WAU within 5%") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = Journey.activeUsers(events, 7).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Journey.approxActiveUsers(events, 7).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet,
      "sketch twin must publish exactly the exact pair's days")
    approx.foreach { case (day, (dauEst, wauEst)) =>
      val (dau, wau) = exact(day)
      assert(math.abs(dauEst - dau) <= math.max(1L, (0.05 * dau).toLong),
        s"$day dau_est $dauEst vs exact $dau")
      assert(math.abs(wauEst - wau) <= math.max(1L, (0.05 * wau).toLong),
        s"$day wau_est $wauEst vs exact $wau")
    }
  }

  test("lifecycleApprox: sketch statuses near-exact on a small domain") {
    // w1 (2024-01-01): u1, u2; w2: u1 (retained), u3 (new); u2 churns
    def ev(u: Long, day: String) =
      (u, java.sql.Timestamp.valueOf(s"2024-01-$day 10:00:00"))
    val e = Seq(ev(1, "01"), ev(2, "02"), ev(1, "08"), ev(3, "09"))
      .toDF("user_id", "ts")
    val out = Journey.lifecycleApprox(e).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    def close(a: Long, b: Long) = math.abs(a - b) <= 1
    val (a1, n1, r1, s1, c1) = out("2024-01-01")
    assert(close(a1, 2) && close(n1, 2) && r1 == 0L && s1 == 0L
      && c1 == -1L)
    val (a2, n2, r2, s2, c2) = out("2024-01-08")
    assert(close(a2, 2) && close(n2, 1) && close(r2, 1) && close(s2, 0)
      && close(c2, 1))
  }

  test("lifecycleApprox tracks the exact lifecycle on real data") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") % 17 === 0)
    try {
      val exact = Journey.lifecycle(ev).collect()
        .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2))
        .toMap.withDefaultValue(0L)
      val approx = Journey.lifecycleApprox(ev).collect()
      assert(approx.nonEmpty)
      approx.foreach { r =>
        val w = r.getDate(0).toString
        def bound(est: Long, ex: Long, what: String): Unit =
          assert(math.abs(est - ex) <= math.max(3L, (0.08 * (ex + 1)).toLong),
            s"$w $what est $est vs exact $ex")
        bound(r.getLong(2), exact((w, "new")), "new")
        bound(r.getLong(3), exact((w, "retained")), "retained")
        bound(r.getLong(4), exact((w, "resurrected")), "resurrected")
        if (!r.isNullAt(5)) bound(r.getLong(5), exact((w, "churned")), "churned")
      }
    } finally {
      // both operators persist internal frames on the SAME sliced
      // input q_cohort's plan audit later builds — a leftover cache
      // entry would alter that audited plan (caller owns the persist
      // lifetime; this test is the caller)
      spark.catalog.clearCache()
    }
  }

  test("funnelWindowed: deadline binds per step, abandonment counted") {
    def ev(u: Long, day: Int, et: String) =
      (u, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), et)
    // u1 converts within every 3-day deadline; u2's click is 9 days
    // late; u3 clicks in time but purchases 18 days later
    val e = Seq(
      ev(1, 1, "view"), ev(1, 2, "click"), ev(1, 3, "purchase"),
      ev(2, 1, "view"), ev(2, 10, "click"),
      ev(3, 1, "view"), ev(3, 2, "click"), ev(3, 20, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Journey.funnelWindowed(e,
      Seq("view", "click", "purchase"), maxGapDays = 3).collect()
      .map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      ("view", 3L, -1L), ("click", 2L, 1L), ("purchase", 1L, 1L)))
  }

  test("conversionWilson: true proportion, exact bound, NULL on empty") {
    // segment 0: users 0, 5, 10, 15 active; only user 5 purchases ->
    // n=4, s=1. Segment 1: user 1 views only -> s=0, lb=0-ish.
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val e = Seq(
      (0L, "view"), (5L, "purchase"), (10L, "view"), (15L, "click"),
      (5L, "view"),          // second event of an existing converter
      (1L, "view"))
      .map { case (u, t) => (u, t, ts) }
      .toDF("user_id", "event_type", "ts")
    val out = Journey.conversionWilson(e, "purchase", 5, 1.96).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val (n, s) = (4L, 1L)
    val (nD, z, z2) = (n.toDouble, 1.96, 1.96 * 1.96)
    val p = s.toDouble / nD
    val lb = (p + z2 / (nD * 2) - z *
      math.sqrt(p * (1.0 - p) / nD + z2 / (nD * nD * 4))) / (1.0 + z2 / nD)
    assert(out(0L) == ((n, s, p, lb)))     // bit-exact same chain
    assert(out(1L)._2 == 0L && out(1L)._3 == 0.0)
    assert(out(0L)._4 > 0.0 && out(0L)._4 < p)
  }

  test("userLifespan: span grid quartiles, single-day share") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-11 10:00:00", "a"),
      (2L, "2024-01-05 10:00:00", "a"),           // span 0
      (3L, "2024-01-01 09:00:00", "a"), (3L, "2024-01-03 09:00:00", "a"))
    val r = Journey.userLifespan(events).collect().head
    // spans {0, 2, 10}: mean 4, p50 = 2
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(4)) == ((3L, 4.0, 1.0 / 3, 2.0)))
  }

  test("transitionEntropy: hand-checked H, degenerate fanout -> 0") {
    val e = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (1L, "2024-01-01 10:01:00", 2L, "b"),
      (1L, "2024-01-01 10:02:00", 3L, "a"),
      (1L, "2024-01-01 10:03:00", 4L, "b"),
      (2L, "2024-01-01 10:00:00", 5L, "a"),
      (2L, "2024-01-01 10:01:00", 6L, "c"))
      .map { case (u, t, id, et) =>
        (u, java.sql.Timestamp.valueOf(t), id, et) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Journey.transitionEntropy(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // from a: b twice, c once -> H = ln3 - (2 ln2)/3, norm /ln2
    val h = math.log(3) - 2 * math.log(2) / 3
    assert(out("a")._1 == 3L && out("a")._2 == 2L)
    assert(math.abs(out("a")._3 - h) < 1e-12)
    assert(math.abs(out("a")._4 - h / math.log(2)) < 1e-12)
    assert(out("b") == ((1L, 1L, 0.0, 0.0))) // single successor
  }

  test("userConcentration: heaviest users land in decile 1") {
    // ten users with 10..1 events of value 1.00 each
    val rows = for (u <- 1 to 10; i <- 1 to (11 - u)) yield
      (u.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 10:$u%02d:$i%02d"),
        (u * 100 + i).toLong, "view", 1.0)
    val e = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Journey.userConcentration(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((1L, 10L, 10.0 / 55, 10.0 / 55, 10.0)))
    assert(out(10L) == ((1L, 1L, 1.0 / 55, 1.0, 1.0)))
    assert(out.size == 10)
  }

  test("userConcentration: matches the ntile window on a heavy-tailed frame") {
    // heavy ties at n_ev=1 (the realistic log tail), a spread of
    // distinct mid-range counts (the grid-growth case the quantile
    // cells exist to bound) and id extremes whose span overflows the
    // old (id−lo)·64 sub-key multiply
    val users: Seq[(Long, Int)] =
      (1 to 60).map(u => (u * 1000L, 1)) ++
        (1 to 25).map(u => (10_000_000L + u * 7L, 1 + u % 9)) ++
        Seq((Long.MinValue / 2, 40), (Long.MaxValue / 2, 37),
          (Long.MaxValue - 1, 3))
    val rows = users.flatMap { case (uid, n) => (1 to n).map { i =>
      (uid, java.sql.Timestamp.valueOf(f"2024-01-0${1 + i % 9} 10:00:00"),
        uid + i, "view", (i % 5) + 0.25)
    } }
    val e = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val out = Journey.userConcentration(e).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(5)))).toMap
    // naive oracle: the single-reducer ntile window the two-phase
    // rank replaces — identical deciles by construction
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_ev").desc, col("user_id"))
    val naive = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        sum(round(col("value") * 100).cast("bigint")).as("cents"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("n_ev")).as("n_events"),
        (sum(col("cents")).cast("double") / 100.0).as("event_value"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out == naive)
  }

  test("stickiness: trailing window counts each user once") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 18:00:00", "view"), // same day, dedupes
      (1L, "2024-01-02 10:00:00", "view"),
      (2L, "2024-01-01 10:00:00", "view"))
    val out = Journey.stickiness(e, windowDays = 2).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("2024-01-01") == ((2L, 2L, 1.0)))
    assert(out("2024-01-02") == ((1L, 2L, 0.5)))
  }

  test("cohortValue: day-7 boundary excluded, per-user division") {
    def e(u: Long, t: String, v: Double) =
      (u, java.sql.Timestamp.valueOf(t), v)
    val events = Seq(
      e(1L, "2024-01-01 10:00:00", 1.0),
      e(1L, "2024-01-07 10:00:00", 2.0),   // day 6: in window
      e(1L, "2024-01-08 10:00:00", 9.0),   // day 7: excluded
      e(2L, "2024-01-01 11:00:00", 4.0))
      .toDF("user_id", "ts", "value")
    val out = Journey.cohortValue(events).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(out == Map("2024-01-01" -> ((2L, 3L, 700L, 350.0))))
  }

  test("revenueAccounting: six categories, churn carries prev cents") {
    // weeks: 2024-01-01 (Mon), 01-08, 01-15, 01-22
    def e(u: Long, t: String, v: Double) =
      (u, java.sql.Timestamp.valueOf(t), v)
    val events = Seq(
      e(1L, "2024-01-01 10:00:00", 1.0),   // u1 w1: new (100c)
      e(1L, "2024-01-08 10:00:00", 2.0),   // u1 w2: expansion (200c)
      e(1L, "2024-01-15 10:00:00", 1.0),   // u1 w3: contraction
      e(2L, "2024-01-01 10:00:00", 3.0),   // u2 w1: new, then silent
      e(2L, "2024-01-15 10:00:00", 3.0),   // u2 w3: resurrected, flat?
      e(3L, "2024-01-08 10:00:00", 5.0), e(3L, "2024-01-08 11:00:00", 0.5))
      .toDF("user_id", "ts", "value")
    val out = Journey.revenueAccounting(events).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("2024-01-01", "new")) == ((2L, 400L)))
    assert(out(("2024-01-08", "expansion")) == ((1L, 200L)))
    assert(out(("2024-01-08", "new")) == ((1L, 550L)))      // u3
    assert(out(("2024-01-08", "churned")) == ((1L, 300L)))  // u2 cents
    assert(out(("2024-01-15", "contraction")) == ((1L, 100L)))
    assert(out(("2024-01-15", "resurrected")) == ((1L, 300L)))
    assert(out(("2024-01-15", "churned")) == ((1L, 550L)))  // u3 gone
    assert(out(("2024-01-22", "churned")) == ((2L, 400L)))  // u1+u2
  }

  test("retentionDays: fixed horizons, dup days collapse, zeros kept") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-01 12:00:00", "a"),
      (1L, "2024-01-02 09:00:00", "a"),   // u1: D1 yes
      (1L, "2024-01-08 09:00:00", "a"),   // u1: D7 yes
      (2L, "2024-01-01 11:00:00", "a"),   // u2: never returns
      (3L, "2024-01-02 10:00:00", "a"),
      (3L, "2024-02-01 10:00:00", "a"))   // u3: D30 yes
    val out = Journey.retentionDays(events).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))).toMap
    assert(out("2024-01-01") == ((2L, 1L, 1L, 0L, 0.5, 0.5, 0.0)))
    assert(out("2024-01-02") == ((1L, 0L, 0L, 1L, 0.0, 0.0, 1.0)))
  }

  test("engagementDist: magnitude buckets with user and event shares") {
    val events = (Seq.fill(3)(1L) ++ Seq.fill(12)(2L) ++ Seq(3L))
      .toDF("user_id")
    val out = Journey.engagementDist(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // 1-digit: u1 (3) + u3 (1); 2-digit: u2 (12); 16 events total
    assert(out == Map(
      1L -> ((2L, 4L, 2.0 / 3, 4.0 / 16)),
      2L -> ((1L, 12L, 1.0 / 3, 12.0 / 16))))
  }

  test("churnRisk: silence vs own cadence, zero-span degenerate") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    val orders = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-11")),  // gap 10, quiet 21
      (2L, d("2024-01-20")), (2L, d("2024-01-30")),  // gap 10, quiet 2
      (3L, d("2024-02-01")),                         // single: frontier
      (4L, d("2024-01-15")), (4L, d("2024-01-15")))  // zero span
      .toDF("o_custkey", "o_orderdate")
    val cust = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val out = Journey.churnRisk(orders, cust).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // c1: 21·1 > 2·10 at risk; c2: 2·1 < 20 fine; c4: 17·1 > 0 at risk
    assert(out == Map(
      "A" -> ((2L, 1L, 0.5)),
      "B" -> ((1L, 1L, 1.0))))
  }
}
