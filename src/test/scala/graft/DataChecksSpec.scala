package graft

import org.apache.spark.sql.functions._
import graft.operators.{DailyQA, DataChecks, GraftDataException}

class DataChecksSpec extends SparkSpec {

  test("oooAudit measures lateness against the global arrival frontier") {
    import spark.implicits._
    // arrival order by event_id; event 3 is 90s behind the frontier
    // set by event 2, event 5 is 30s behind event 4's frontier
    val e = Seq(
      (1L, "2024-01-01 10:00:00", "a"),
      (2L, "2024-01-01 10:05:00", "a"),
      (3L, "2024-01-01 10:03:30", "b"), // 90s late vs 10:05
      (4L, "2024-01-01 10:10:00", "b"),
      (5L, "2024-01-01 10:09:30", "a")) // 30s late vs 10:10
      .map { case (id, t, et) =>
        (id, java.sql.Timestamp.valueOf(t), et) }
      .toDF("event_id", "ts", "event_type")
    // bucketSize 3: ids 1-2 in bucket 0, 3-5 in bucket 1 — event 3 is
    // its bucket's FIRST row, so its frontier comes from the offset
    // phase; event 5's comes from the local prefix
    val out = DataChecks.oooAudit(e, Seq(60), bucketSize = 3).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out("a") == ((3L, 1L, 30.0, 0L))) // 30s late, under 60s
    assert(out("b") == ((2L, 1L, 90.0, 1L))) // 90s late, dropped at 60s
  }

  test("ruleCheck: one pass, NULL predicate counts as violation") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -5.0), (null, 20.0), (4L, null))
      .toDF("id", "amount")
    val out = DataChecks.ruleCheck(df, Seq(
      "amount_positive" -> (col("amount") > 0),
      "id_not_null" -> col("id").isNotNull))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // amount: -5 fails, NULL fails (Kleene middle is not a pass)
    assert(out("amount_positive") == ((4L, 2L, 0.5)))
    assert(out("id_not_null") == ((4L, 1L, 0.25)))
  }

  test("dailyTrend fits the exact slope and NULLs a single-day type") {
    import spark.implicits._
    // type a: 1, 2, 3 events on three consecutive days -> slope 1,
    // intercept 1; type b: one day -> zero x-variance -> NULLs
    val rows =
      (1 to 1).map(i => ("a", s"2024-01-01 0$i:00:00")) ++
        (1 to 2).map(i => ("a", s"2024-01-02 0$i:00:00")) ++
        (1 to 3).map(i => ("a", s"2024-01-03 0$i:00:00")) ++
        Seq(("b", "2024-01-02 05:00:00"))
    val e = rows.toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = DataChecks.dailyTrend(e).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 3L && out("a").getLong(2) == 6L)
    assert(out("a").getDouble(3) == 1.0 && out("a").getDouble(4) == 1.0)
    assert(out("b").isNullAt(3) && out("b").isNullAt(4))
  }

  test("sourceDrift: disjoint length distributions give KS = 1") {
    import spark.implicits._
    import graft.operators.DataChecks
    // source a: all docs in bucket 0 (short); source b: bucket 2
    val df = (Seq.fill(10)(("a", "x" * 20)) ++
      Seq.fill(10)(("b", "y" * 120)))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
    val out = DataChecks.sourceDrift(df).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("a") == 1.0 && out("b") == 1.0)
    // single source: no complement -> NULL ks
    val solo = Seq((1L, "abc", "only")).toDF("doc_id", "text", "source")
    val so = DataChecks.sourceDrift(solo).collect()
    assert(so.length == 1 && so.head.isNullAt(2))
  }
  import spark.implicits._

  private def qa = Seq(
    ("a", 100L, 100L), ("b", 100L, 90L), ("c", 100L, 50L))
    .toDF("dim", "exe_imp", "impressions")
    .withColumn("pct_diff",
      (col("impressions") - col("exe_imp")).cast("double") / col("impressions"))

  test("requireColumns names every missing column") {
    val e = intercept[GraftDataException] {
      DataChecks.requireColumns(qa, Seq("dim", "date", "impressions", "nope"), "ctx")
    }
    assert(e.getMessage.contains("date") && e.getMessage.contains("nope"))
    assert(!e.getMessage.startsWith("ctx: missing required column(s) dim"))
    // present columns pass silently
    DataChecks.requireColumns(qa, Seq("dim", "impressions"), "ctx")
  }

  test("requireTimeColumn rejects non-time types") {
    val df = Seq(("2024-01-01", 1L)).toDF("s", "n")
      .withColumn("d", to_date(col("s")))
      .withColumn("ts", to_timestamp(col("s")))
    DataChecks.requireTimeColumn(df, "d", "ctx")
    DataChecks.requireTimeColumn(df, "ts", "ctx")
    val e = intercept[GraftDataException] {
      DataChecks.requireTimeColumn(df, "s", "ctx")
    }
    assert(e.getMessage.contains("timestamp/date"))
    intercept[GraftDataException] {
      DataChecks.requireTimeColumn(df, "missing", "ctx")
    }
  }

  test("flagExceedances keeps only rows past tolerance, never NULLs") {
    val withNull = qa.unionAll(
      Seq(("d", 100L)).toDF("dim", "exe_imp")
        .withColumn("impressions", lit(null).cast("long"))
        .withColumn("pct_diff", lit(null).cast("double")))
    val out = DataChecks.flagExceedances(withNull, 0.2).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("c"))
    assert(out.head.getAs[Double]("abs_pct_diff") == 1.0)
    assert(out.head.getAs[Double]("tolerance") == 0.2)
    intercept[GraftDataException] {
      DataChecks.flagExceedances(qa.drop("pct_diff"), 0.2)
    }
  }

  test("multiGroupingQA stacks all shapes with reference labels") {
    // two dims over four days; ad side misses day 4 entirely
    val log = Seq(
      ("x", "s1", "2024-01-01"), ("x", "s1", "2024-01-02"),
      ("y", "s2", "2024-01-03"), ("y", "s1", "2024-01-04"),
      ("x", "s2", "2024-01-04")
    ).toDF("etype", "site", "ds")
      .withColumn("date", to_date(col("ds"))).drop("ds")
      .withColumn("conf", lit("c1"))
    val ad = log.where(col("date") =!= "2024-01-04").drop("conf")
    val out = DailyQA.multiGroupingQA(log, Some(ad), Seq("etype", "site"),
      period = 2, metaCol = Some("conf"))
    val rows = out.collect()
    val labels = rows.map(_.getString(0)).distinct.sorted
    assert(labels.toSeq ==
      Seq("date", "etype", "etype date", "site", "site date"))
    val dates = rows.map(_.getString(2)).distinct.sorted
    assert(dates.contains("2 days") && dates.contains("whole period"))
    // whole-period etype block: x has 3 log rows, 2 ad rows
    val x = rows.find(r => r.getString(0) == "etype" && r.getString(1) == "x"
      && r.getString(2) == "whole period").get
    assert(x.getLong(3) == 3 && x.getLong(4) == 2 && x.getLong(5) == -1)
    assert(x.getString(7) == "c1")
    // trailing-2-day by-date block only covers the last 2 dates
    val byDate = rows.filter(r => r.getString(0) == "etype date")
    assert(byDate.map(_.getString(2)).forall(
      d => d == "2024-01-03" || d == "2024-01-04"))
    // ad side absent on day 4 → NULL impressions/diff/pct_diff
    val day4 = byDate.filter(_.getString(2) == "2024-01-04")
    assert(day4.nonEmpty && day4.forall(_.isNullAt(4)))
    // preflight: a dim missing from the log side raises
    intercept[GraftDataException] {
      DailyQA.multiGroupingQA(log, Some(ad), Seq("etype", "campaign"), 2, None)
    }
    // no ad table (the reference's adServer-absent path): log counts
    // survive, impressions/diff/pct_diff are NULL throughout
    val noAd = DailyQA.multiGroupingQA(log, None, Seq("etype"), 2, None).collect()
    assert(noAd.nonEmpty)
    assert(noAd.forall(r => r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6)))
    assert(noAd.exists(r => r.getString(0) == "etype" && r.getLong(3) > 0))
  }

  test("runToCsv writes the QA table, or the error as the artifact") {
    import org.apache.spark.sql.functions.{col, lit, to_date}
    val log = Seq(("x", "2024-01-01"), ("y", "2024-01-02")).toDF("etype", "ds")
      .withColumn("date", to_date(col("ds"))).drop("ds")
    val out = java.nio.file.Files.createTempDirectory("graft-qa").toString
    assert(DailyQA.runToCsv(log, None, Seq("etype"), 2, None, s"$out/ok"))
    assert(spark.read.option("header", "true").csv(s"$out/ok").count() > 0)
    // structurally unusable: the artifact is the error, not an absence
    assert(!DailyQA.runToCsv(log, None, Seq("missing_dim"), 2, None, s"$out/err"))
    val err = spark.read.option("header", "true").csv(s"$out/err").collect()
    assert(err.length == 1 && err.head.getString(0).contains("missing_dim"))
  }

  test("profile: exact counts, nulls, distincts, typed min/max in one pass") {
    val df = Seq(
      (Some(1.0), Some("a")), (Some(3.0), Some("b")),
      (None, Some("a")), (Some(3.0), None))
      .toDF("x", "s")
    val p = DataChecks.profile(df, Seq("x"), Seq("s"))
    val rows = p.collect().map(r => r.getString(0) -> r).toMap
    val x = rows("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 1 && x.getLong(3) == 2)
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 3.0)
    assert(x.getDouble(6) == 2.33) // mean of 1,3,3 rounded
    assert(x.getDouble(7) == 3.0)  // exact median of 1,3,3
    assert(x.isNullAt(8) && x.isNullAt(9))
    val s = rows("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.getString(8) == "a" && s.getString(9) == "b")
    // per-column pruned-scan shape: no Expand (the multi-distinct
    // single-scan plan that multiplies every row once per column),
    // one hash-aggregate leg per profiled column instead
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan.take(3000))
  }

  test("profile: the median plan switch never changes a value") {
    // fractional-position interpolation (even total count) + a null +
    // repeated values — the cases where the two median plans could
    // diverge if they weren't replaying the same double sequence
    val df = (Seq.fill(3)(7.25) ++ Seq(1.5, 2.0, 4.75) ++
      Seq.fill(2)(2.0)).map(Option(_)).appended(None)
      .toDF("x").withColumn("s", lit("k"))
    val single = DataChecks.profile(df, Seq("x"), Seq("s"),
      medianSingleTaskMax = Long.MaxValue).collect().toSeq
    val dist = DataChecks.profile(df, Seq("x"), Seq("s"),
      medianSingleTaskMax = 0L).collect().toSeq
    assert(single == dist && single.nonEmpty)
  }

  test("distributionDrift reports shares, deltas and guarded chi2 terms") {
    import spark.implicits._
    val base = Seq("a", "a", "a", "b").toDF("event_type")       // a .75, b .25
    val cur = Seq("a", "b", "c", "c").toDF("event_type")        // a .25, b .25, c .5
    val out = DataChecks.distributionDrift(base, cur, "event_type")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 3 && out("a").getLong(2) == 1)
    assert(out("a").getDouble(3) == 0.75 && out("a").getDouble(4) == 0.25)
    assert(out("a").getDouble(5) == -0.5)
    assert(math.abs(out("a").getDouble(6) - 0.25 / 0.75) < 1e-15)
    assert(out("b").getDouble(5) == 0.0 && out("b").getDouble(6) == 0.0)
    // brand-new category: no base share → chi2 NULL, never /0
    assert(out("c").getLong(1) == 0 && out("c").getDouble(4) == 0.5)
    assert(out("c").isNullAt(6))
    // vanished category: present with n_cur = 0
    val gone = DataChecks.distributionDrift(cur, base, "event_type")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(gone("c").getLong(2) == 0 && gone("c").getDouble(4) == 0.0)
  }

  test("histogram bins with open under/overflow edges and within-dim shares") {
    import spark.implicits._
    val df = Seq(
      ("a", -5.0), ("a", 0.0), ("a", 49.9), ("a", 50.0), ("a", 1000.0),
      ("b", 25.0), ("b", 25.0))
      .toDF("event_type", "value")
      .unionAll(Seq("b").toDF("event_type")
        .withColumn("value", lit(null).cast("double")))
    val out = DataChecks.histogram(df, "value", "event_type", 0.0, 50.0, 10)
      .collect()
    val a = out.filter(_.getString(0) == "a")
      .map(r => r.getInt(1) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(a(-1) == ((1L, 0.2)), "underflow bin")
    assert(a(0) == ((2L, 0.4)))
    assert(a(1) == ((1L, 0.2)))
    assert(a(10) == ((1L, 0.2)), "overflow bin")
    // open edges have NULL bounds; interior bins carry both
    val rows = out.filter(_.getString(0) == "a").map(r => r.getInt(1) -> r).toMap
    assert(rows(-1).isNullAt(2) && rows(10).isNullAt(3))
    assert(rows(1).getDouble(2) == 50.0 && rows(1).getDouble(3) == 100.0)
    // NULL values are excluded, shares still sum to 1 within b
    val b = out.filter(_.getString(0) == "b")
    assert(b.map(_.getLong(4)).sum == 2L)
    assert(b.map(_.getDouble(5)).sum == 1.0)
  }

  test("anomalyFlags flags a planted spike, honors minDays warmup") {
    import spark.implicits._
    // 9 quiet days (counts 10 or 12, alternating) then a 100x spike
    val rows = (1 to 9).flatMap { d =>
      val n = if (d % 2 == 0) 12 else 10
      (1 to n).map(i => (s"2024-01-0$d".take(10), "t"))
    } ++ (1 to 500).map(_ => ("2024-01-10", "t"))
    val df = rows.toDF("ds", "event_type")
      .withColumn("ts", to_timestamp(concat(col("ds"), lit(" 00:00:00"))))
    val out = DataChecks.anomalyFlags(df, windowDays = 7, k = 3, minDays = 4)
      .collect().map(r => r.getDate(0).toString -> r.getBoolean(5)).toMap
    assert(out("2024-01-10"), "spike day must flag")
    // warmup: first minDays days have too few baseline days to flag
    assert(!out("2024-01-01") && !out("2024-01-02") &&
      !out("2024-01-03") && !out("2024-01-04"))
    // quiet post-warmup days never flag
    assert(!out("2024-01-08") && !out("2024-01-09"))
  }

  test("coverageCheck counts orphans per category, dedupes the universe") {
    import spark.implicits._
    val facts = Seq((1L, "a"), (1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("user_id", "event_type")
    // key 1 duplicated in the universe — must not double-count facts
    val uni = Seq(1L, 1L, 3L).toDF("c_custkey")
    val out = DataChecks.coverageCheck(facts, uni, "user_id", "c_custkey",
      "event_type").collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 3 && out("a").getLong(2) == 2)
    assert(out("a").getLong(3) == 1)
    assert(out("a").getDouble(4) == 1.0 / 3.0)
    assert(out("b").getLong(3) == 0 && out("b").getDouble(4) == 0.0)
  }

  test("percentileBands computes exact quartiles on the cent grid") {
    import spark.implicits._
    // values 1.00..4.00: quartiles of [100,200,300,400] cents are
    // 175/250/325 → 1.75/2.50/3.25
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0))
      .toDF("event_type", "value")
      .unionAll(Seq(("a", Option.empty[Double])).toDF("event_type", "value"))
    val out = DataChecks.percentileBands(df, "value", "event_type").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 4, "NULL values excluded")
    assert(r.getDouble(2) == 1.75 && r.getDouble(3) == 2.5 &&
      r.getDouble(4) == 3.25)
  }

  test("tableDiff classifies added/removed/changed with column names") {
    import spark.implicits._
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, null.asInstanceOf[String], 40.0)).toDF("k", "name", "bal")
    val after = Seq((1L, "a", 10.0), (2L, "b2", 21.0),
      (4L, "now-set", 40.0), (5L, "new", 50.0)).toDF("k", "name", "bal")
    val out = DataChecks.tableDiff(before, after, "k", Seq("name", "bal"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(out.size == 4, "unchanged row 1 not emitted")
    assert(out(2L) == (("changed", "name,bal")))
    assert(out(3L)._1 == "removed" && out(3L)._2 == null)
    assert(out(4L) == (("changed", "name")), "NULL -> value is a change")
    assert(out(5L)._1 == "added")
  }

  test("scd merge2 closes changed rows, passes no-ops and history") {
    import spark.implicits._
    import graft.operators.Scd
    val d = (s: String) => java.sql.Date.valueOf(s)
    val current = Seq(
      // history row: must pass through untouched
      (1L, "old-name", d("2023-01-01"), d("2023-06-01")),
      (1L, "k1-v2", d("2023-06-01"), null.asInstanceOf[java.sql.Date]),
      (2L, "k2-v1", d("2023-01-01"), null.asInstanceOf[java.sql.Date]),
      (3L, "k3-v1", d("2023-01-01"), null.asInstanceOf[java.sql.Date]))
      .toDF("k", "name", "effective_from", "effective_to")
    val updates = Seq(
      (1L, "k1-v3", d("2024-01-01")),  // differs -> close + open
      (2L, "k2-v1", d("2024-01-01")),  // identical -> no-op
      (9L, "k9-v1", d("2024-01-01"))) // new key -> open
      .toDF("k", "name", "eff")
    val out = Scd.merge2(current, updates, "k", Seq("name"), "eff")
      .collect().map(r => (r.getLong(0), r.getString(1),
        String.valueOf(r.getDate(2)), String.valueOf(r.getDate(3))))
    assert(out.toSet == Set(
      (1L, "old-name", "2023-01-01", "2023-06-01"),
      (1L, "k1-v2", "2023-06-01", "2024-01-01"),
      (1L, "k1-v3", "2024-01-01", "null"),
      (2L, "k2-v1", "2023-01-01", "null"),
      (3L, "k3-v1", "2023-01-01", "null"),
      (9L, "k9-v1", "2024-01-01", "null")))
  }

  test("cdc apply: last writer wins, deletes drop, resurrect works") {
    import spark.implicits._
    import graft.operators.Scd
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "name", "bal")
    val chg = Seq(
      (2L, "b2", 21.0, 1L, "U"),   // plain update
      (3L, "c", 30.0, 1L, "U"),    // update then...
      (3L, "c", 30.0, 2L, "D"),    //   ...delete: delete wins
      (4L, "d", 40.0, 1L, "D"),    // delete then...
      (4L, "d4", 44.0, 2L, "U"),   //   ...upsert: resurrects
      (9L, "new", 90.0, 1L, "U"),  // insert of unseen key
      (8L, "x", 0.0, 1L, "D"))     // delete of unseen key: no-op
      .toDF("k", "name", "bal", "seq", "op")
    val out = Scd.applyCdc(snap, chg, "k", Seq("name", "bal"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.toSet == Set(
      (1L, "a", 10.0, 0L),    // untouched passthrough, version 0
      (2L, "b2", 21.0, 1L),
      (4L, "d4", 44.0, 2L),
      (9L, "new", 90.0, 1L)))
  }

  test("winsorize clips dyadic tails exactly") {
    import spark.implicits._
    val vals = (1 to 15).map(_.toDouble) :+ 100.0
    val df = vals.map(("a", _)).toDF("dim", "v")
    val r = DataChecks.winsorize(df, "v", "dim").collect()(0)
    assert(r.getLong(1) == 16L)
    // lo = interp(0.9375 between 100,200 cents), hi = interp between
    // 1500 and 10000 cents — both exact dyadics
    assert(r.getDouble(2) == 1.9375 && r.getDouble(3) == 20.3125)
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L)
    assert(r.getDouble(6) == 13.75)
    assert(r.getDouble(7) == 14125.0 / 16 / 100.0)
  }

  test("mergeRollup: split-batch partials merge to the whole; exact var") {
    import spark.implicits._
    import graft.operators.Analytics
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("a", t("2024-01-01 10:00:00"), 1.00),
      ("a", t("2024-01-01 11:00:00"), 3.00),
      ("a", t("2024-01-02 10:00:00"), 5.00),
      ("b", t("2024-01-03 10:00:00"), 2.50))
    val ev = rows.toDF("event_type", "ts", "value")
    val whole = Analytics.mergeRollup(Analytics.dailyPartials(ev))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    // population variance of {1,3,5} = 8/3, computed on the cent grid
    // as (3·350000 − 900²)/9/10⁴ — replicate the op order exactly
    assert(whole == Set(
      ("a", 3L, 2L, 3.0, 240000.0 / 9 / 10000.0),
      ("b", 1L, 1L, 2.5, 0.0)))
    // merging partials computed over disjoint batches = the whole
    val h1 = Analytics.dailyPartials(rows.take(2).toDF("event_type", "ts", "value"))
    val h2 = Analytics.dailyPartials(rows.drop(2).toDF("event_type", "ts", "value"))
    // re-aggregate the unioned partials at day grain before the rollup
    // (two batches may both carry a partial for the same (type, day))
    val merged = h1.unionByName(h2)
      .groupBy("event_type", "day")
      .agg(sum("n").as("n"), sum("sum_c").as("sum_c"),
        sum("sumsq_c").as("sumsq_c"), min("min_c").as("min_c"),
        max("max_c").as("max_c"))
    val viaParts = Analytics.mergeRollup(merged)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(viaParts == whole)
  }

  test("entity resolve: best-in-block, ties deterministic, misses NULL") {
    import spark.implicits._
    import graft.operators.Entity
    val clean = Seq((1L, "node-0001"), (2L, "nude-0001"), (3L, "node-0002"))
      .toDF("id", "name")
    val dirty = Seq(
      (10L, "nodx-0001"),  // dist 1 to clean 1, dist 2 to clean 2
      (11L, "nzdz-0001"),  // dist 2 to BOTH -> tie breaks to clean 1
      (12L, "node-9999"),  // block 9999 empty -> NULL match
      (13L, "zzzz-0002"))  // in-block candidate at dist 4 > max -> NULL
      .toDF("id", "name")
    val out = Entity.resolve(dirty, clean, "id", "name", 4, 2)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(out == Set((10L, 1L, 1), (11L, 1L, 2), (12L, -1L, -1),
      (13L, -1L, -1)))
  }

  test("fanoutAudit buckets key multiplicities and predicts join rows") {
    import spark.implicits._
    // key 1: 1×3, key 2: 2×0 (right orphan of the left), key 3: 0×1
    val left = Seq(1L, 2L, 2L).toDF("lk")
    val right = Seq(1L, 1L, 1L, 3L).toDF("rk")
    val out = DataChecks.fanoutAudit(left, right, "lk", "rk", multCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (0L, 1L, 1L, 0L, 1L, 0L),   // key 3: right-only
      (1L, 3L, 1L, 1L, 3L, 3L),   // key 1: 1×3 -> 3 join rows
      (2L, 0L, 1L, 2L, 0L, 0L)))  // key 2: left-only
  }

  test("fanoutAudit caps the multiplicity buckets") {
    import spark.implicits._
    val left = Seq.fill(10)(7L).toDF("lk")   // multiplicity 10 > cap 3
    val right = Seq(7L).toDF("rk")
    val out = DataChecks.fanoutAudit(left, right, "lk", "rk", multCap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    // bucket reads (3+, 1) but the exact join cardinality is preserved
    assert(out.toSeq == Seq((3L, 1L, 10L)))
  }

  test("chi2Independence emits exact marginals and per-cell terms") {
    import spark.implicits._
    // 2024-01-01 is a Monday (isodow 1), 01-02 Tuesday (2):
    // A: 3 Mon + 1 Tue; B: 1 Mon + 3 Tue -> all expected cells = 2
    def ev(n: Int, day: String, et: String) = Seq.tabulate(n)(i =>
      (java.sql.Timestamp.valueOf(s"2024-01-0$day 10:0$i:00"), et))
    val e = (ev(3, "1", "A") ++ ev(1, "2", "A") ++
      ev(1, "1", "B") ++ ev(3, "2", "B"))
      .toDF("ts", "event_type")
    val out = DataChecks.chi2Independence(e).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq == Seq(
      ("A", 1, 3L, 2.0, 0.5), ("A", 2, 1L, 2.0, 0.5),
      ("B", 1, 1L, 2.0, 0.5), ("B", 2, 3L, 2.0, 0.5)))
  }

  test("autocorr is exactly 1 on a linear ramp and skips absent lags") {
    import spark.implicits._
    // day d has d events, days 1..5 — lag-1 pairs are perfectly
    // linearly related, so r = 1.0 EXACTLY (num == varx == vary);
    // lag 7 has no pairs and emits no row rather than a NULL row
    val e = (1 to 5).flatMap(d => Seq.tabulate(d)(i =>
      (java.sql.Timestamp.valueOf(s"2024-01-0$d 10:0$i:00"), "A")))
      .toDF("ts", "event_type")
    val out = DataChecks.autocorr(e, Seq(1, 7)).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("A", 1, 4L, 1.0)))
  }

  test("freshness: closed-corpus frontier lag and trailing counts") {
    import spark.implicits._
    // corpus frontier = A's event on day 3 10:00; B stopped on day 1
    val e = Seq(
      ("A", "2024-01-01 10:00:00"), ("A", "2024-01-03 10:00:00"),
      ("B", "2024-01-01 09:00:00"))
      .map { case (t, s) => (t, java.sql.Timestamp.valueOf(s)) }
      .toDF("event_type", "ts")
    val out = DataChecks.freshness(e, Seq(1, 7)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out("A") == ((2L, 0L, 1L, 2L)))
    // B: 2 days + 1 hour behind the frontier; nothing in the last day
    assert(out("B") == ((1L, 2L * 86400L + 3600L, 0L, 1L)))
  }

  test("seasonality: weekday index over active days only") {
    import spark.implicits._
    // 2024-01-01/08 are Mondays (2 + 4 events), 01-02 a Tuesday (6):
    // Monday mean 3 vs overall mean 4 -> idx 0.75; Tuesday 6/4 -> 1.5
    def ev(day: String, n: Int) = Seq.tabulate(n)(i =>
      ("A", java.sql.Timestamp.valueOf(s"2024-01-$day 10:0$i:00")))
    val e = (ev("01", 2) ++ ev("08", 4) ++ ev("02", 6))
      .toDF("event_type", "ts")
    val out = DataChecks.seasonality(e).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1) == ((2L, 6L, 3.0, 0.75)))
    assert(out(2) == ((1L, 6L, 6.0, 1.5)))
  }

  test("seasonalDecompose: trend + weekday effect + ~zero residual") {
    import spark.implicits._
    // 21 days from Mon 2024-01-01: 10/day plus a +7 Friday bump.
    // Interior days (full 7-day window) decompose exactly: trend =
    // (7·10 + 7)/7 = 11, seasonal(Fri) = +6, seasonal(else) = −1,
    // residual 0 up to the 1e-6 quantization grain.
    val e = (0 until 21).flatMap { d =>
      val n = if (d % 7 == 4) 17 else 10 // day 4 = Friday
      Seq.tabulate(n)(i => ("A",
        java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:$i%02d:00")))
    }.toDF("event_type", "ts")
    val out = DataChecks.seasonalDecompose(e, half = 3).collect()
    assert(out.length == 21)
    val byDay = out.map(r => r.getDate(1).toString -> r).toMap
    // edge days have no full centered window
    Seq("2024-01-01", "2024-01-03", "2024-01-19", "2024-01-21").foreach {
      d => assert(byDay(d).isNullAt(4) && byDay(d).isNullAt(5) &&
        byDay(d).isNullAt(6), s"$d must be NULL-trend")
    }
    val fri = byDay("2024-01-12") // interior Friday
    val tue = byDay("2024-01-09") // interior Tuesday
    assert(fri.getLong(3) == 17L && tue.getLong(3) == 10L)
    assert(fri.getDouble(4) == 11.0 && tue.getDouble(4) == 11.0)
    assert(math.abs(fri.getDouble(5) - 6.0) < 1e-5)
    assert(math.abs(tue.getDouble(5) + 1.0) < 1e-5)
    assert(math.abs(fri.getDouble(6)) < 1e-5)
    assert(math.abs(tue.getDouble(6)) < 1e-5)
    // the three components reassemble the observed count
    out.filterNot(_.isNullAt(4)).foreach { r =>
      val sum = r.getDouble(4) + r.getDouble(5) + r.getDouble(6)
      assert(math.abs(sum - r.getLong(3)) < 1e-5)
    }
  }

  test("changepoint finds the level-shift day, gap- and guard-correct") {
    import spark.implicits._
    // days 1–5 at 2/day, days 6–10 at 10/day: the shift opens at day 6
    // (before-mean 2 over days 3–5, after-mean 10 over days 6–8)
    val e = (1 to 10).flatMap { d =>
      val n = if (d <= 5) 2 else 10
      Seq.tabulate(n)(i =>
        (java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:$i%02d:00"), "A"))
    }.toDF("ts", "event_type")
    val out = DataChecks.changepoint(e, windowDays = 3, minDays = 2)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDate(1).toString == "2024-01-06")
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 10.0)
    assert(r.getDouble(6) == 8.0)
  }

  test("autocorr returns NULL acf on zero variance") {
    import spark.implicits._
    // constant daily counts: varx = vary = 0 -> NULL, not an error
    val e = (1 to 3).map(d =>
      (java.sql.Timestamp.valueOf(s"2024-01-0$d 10:00:00"), "A"))
      .toDF("ts", "event_type")
    val out = DataChecks.autocorr(e, Seq(1)).collect()
    assert(out.length == 1 && out(0).isNullAt(3))
  }

  test("approx percentile bands track the exact quartiles") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = DataChecks.percentileBands(ev, "value", "event_type")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val approx = DataChecks.percentileBandsApprox(ev, "value", "event_type")
      .collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (e25, e50, e75) = exact(r.getString(0))
      // sketch error is in RANK; on this smooth distribution the
      // value deviation stays within a few percent of the exact cut
      assert(math.abs(r.getDouble(2) - e25) <= 0.05 * e25 + 1,
        s"p25 ${r.getDouble(2)} vs $e25")
      assert(math.abs(r.getDouble(3) - e50) <= 0.05 * e50 + 1)
      assert(math.abs(r.getDouble(4) - e75) <= 0.05 * e75 + 1)
    }
  }

  test("joinSkewAdvisor: exact contributions, prefix shares, pow2 ladder") {
    import spark.implicits._
    // hot key 1 on both sides: 3x4=12 of 12+1+1=14 output rows
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val right = Seq(1L, 1L, 1L, 1L, 2L, 3L).toDF("k")
    val out = DataChecks.joinSkewAdvisor(left, right, "k", "k",
      topK = 2, targetPerBucket = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(6), r.getLong(7)))
    // total 14, target 4 -> need ceil(14/4)=4 -> buckets 4 (exact
    // power of two: the integer bit-length ladder must not round up
    // to 8 the way a ln-based log2 can)
    assert(out.toSeq == Seq(
      (1L, 3L, 4L, 12L, 12.0 / 14.0, 4L),
      (2L, 1L, 1L, 1L, 1.0 / 14.0, 4L)))
  }

  test("ewmaAnomaly flags a spike against a recency-weighted baseline") {
    import spark.implicits._
    import java.sql.Timestamp
    val rows =
      (1 to 8).flatMap(d => (1 to 10).map(i =>
        (Timestamp.valueOf(f"2024-01-0$d%d 01:${i}%02d:00"), "t"))) ++
      (1 to 99).map(i =>
        (Timestamp.valueOf(f"2024-01-09 01:${i % 60}%02d:00"), "t"))
    val out = DataChecks.ewmaAnomaly(rows.toDF("ts", "event_type"))
      .collect().map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4), r.getBoolean(5))))
      .toMap
    // steady 10/day: ewma = 10 exactly, no flags on quiet days
    assert(out("2024-01-08") == ((10L, 7L, 10.0, false)))
    assert(out("2024-01-09")._1 == 99L && out("2024-01-09")._4,
      "the 99-event day flags against the 10/day EWMA")
    assert(!out("2024-01-01")._4 && out("2024-01-01")._2 == 0L,
      "warmup day has no baseline and never flags")
  }

  test("benfordQa: digits from integer cents, dense spine, chi2 flags") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // type "flat": 90 values all starting with digit 9 (9.00..9.89)
    // -> wildly non-Benford, must flag. type "skip": digits 1 and 2
    // only -> spine still emits all 9 digits with zero counts.
    val flat = (0 until 90).map(i => (ts, "flat", Some(9.0 + i * 0.01)))
    val skip = Seq((ts, "skip", Some(1.23)), (ts, "skip", Some(0.25)),
      (ts, "skip", Some(100.0)), (ts, "skip", Some(0.0)), // 0 cents drops
      (ts, "skip", None: Option[Double]))
    val ev = (flat ++ skip).toDF("ts", "event_type", "value")
    val out = DataChecks.benfordQa(ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(6)))).toMap
    assert(out.size == 18, "9-digit spine per type")
    assert(out(("flat", 9))._1 == 90L && out(("flat", 9))._2 == 1.0)
    assert(out(("flat", 9))._3, "all-nines flags suspect")
    assert(out(("skip", 1))._1 == 2L, "1.23 and 100.0 both lead with 1")
    assert(out(("skip", 2))._1 == 1L, "0.25 -> 25 cents -> digit 2")
    assert(out(("skip", 5))._1 == 0L, "zero-count digit present on spine")
  }

  test("madAnomaly: robust to the outlier the z-rule absorbs") {
    import spark.implicits._
    // 9 days at 10 events + one 50-event day: median 10, MAD 0 on the
    // flat mass -> the spike flags; flat days do not
    val rows = (1 to 9).flatMap(d => (1 to 10).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-0$d%d 10:00:00"), "a"))) ++
      (1 to 50).map(i =>
        (java.sql.Timestamp.valueOf("2024-01-10 10:00:00"), "a"))
    val ev = rows.toDF("ts", "event_type")
    val out = DataChecks.madAnomaly(ev).collect()
      .map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    assert(out.size == 10)
    assert(out("2024-01-10") == ((50L, 10.0, 0.0, true)),
      "spike day flags against median 10 / MAD 0")
    assert(out("2024-01-01") == ((10L, 10.0, 0.0, false)),
      "flat day |n-med| = 0 is not > 0")
  }

  test("fdAudit: holding FD reports zero violations, forked key flags") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "HI"), (2L, 10L, "LO"),   // k->c holds; c=10 -> {HI,LO}
      (3L, 20L, "HI"), (3L, 21L, "HI"))   // k=3 forked: c in {20,21}
      .toDF("k", "c", "p")
    val out = DataChecks.fdAudit(df, Seq(("k", "c"), ("c", "p")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    assert(out(("k", "c")) == ((3L, 1L, 1.0 / 3.0, 2L, false)),
      "key 3 determines two custkeys -> violated")
    assert(out(("c", "p")) == ((3L, 1L, 1.0 / 3.0, 2L, false)))
    val holds = DataChecks.fdAudit(df.where(col("k") < 3), Seq(("k", "c")))
      .collect()(0)
    assert(holds.getLong(3) == 0L && holds.getBoolean(6), "clean FD holds")
  }

  test("corrMatrix: perfect, anti and zero-variance pairs") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0)).toDF("a", "b", "neg", "const")
    val out = DataChecks.corrMatrix(df,
      Seq(("a", 2), ("b", 2), ("neg", 2), ("const", 2))).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out.size == 6)
    assert(out(("a", "b")).contains(1.0), "b = 2a -> r exactly 1")
    assert(out(("a", "neg")).contains(-1.0), "neg = -a -> r exactly -1")
    assert(out(("a", "const")).isEmpty, "zero variance -> NULL not NaN")
    assert(out(("b", "neg")).contains(-1.0))
  }

  test("valueDist: cent-grid quartiles and exact mean per type") {
    val events = Seq(
      ("a", 1.00), ("a", 2.00), ("a", 3.00),   // cents 100/200/300
      ("b", 0.10))
      .toDF("event_type", "value")
    val out = DataChecks.valueDist(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))).toMap
    // {100,200,300}: p25=150, p50=200, p75=250, p95=290 (inexact idx)
    val a = out("a")
    assert((a._1, a._2, a._3, a._4, a._5) == ((3L, 2.0, 1.5, 2.0, 2.5)))
    assert(math.abs(a._6 - 2.9) < 1e-9)
    assert(out("b") == ((1L, 0.1, 0.1, 0.1, 0.1, 0.1)))
  }

  test("sampleBias: uniform modulus passes, skewed one flags") {
    // type a: ids 0..9 -> exactly 1 sampled of 10; type b: ids all
    // ≡ 0 (mod 10) -> wildly over-sampled
    val events = ((0L to 9L).map(i => (i, "a")) ++
      (1L to 5L).map(i => (i * 10L, "b")))
      .toDF("event_id", "event_type")
    val out = DataChecks.sampleBias(events, mod = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(5)))).toMap
    // totals: full 15, sampled 6; expected a = 10*6/15 = 4, b = 2
    assert(out("a") == ((10L, 1L, 4.0, 0)))   // (1-4)²/4 = 2.25 < 3.841
    assert(out("b") == ((5L, 5L, 2.0, 1)))    // (5-2)²/2 = 4.5 flags
  }

  test("errorShare: per-hour rate with a sane Wilson bound") {
    val events = Seq(
      ("2024-01-01 03:00:01", "error"), ("2024-01-01 03:10:00", "view"),
      ("2024-01-01 09:00:00", "view"), ("2024-01-01 09:30:00", "view"))
      .toDF("tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = DataChecks.errorShare(events).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(3)._1 == 2L && out(3)._2 == 1L && out(3)._3 == 0.5)
    assert(out(3)._4 > 0.0 && out(3)._4 < 0.5)
    assert((out(9)._1, out(9)._2, out(9)._3) == ((2L, 0L, 0.0)))
    assert(math.abs(out(9)._4) < 1e-12, "p=0 bound collapses to ~0")
  }

  test("weekdayAnova: perfect separation is 1, anti-balanced is 0") {
    import spark.implicits._
    def day(d: String, t: String, n: Int) = (1 to n).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"$d 10:00:${i % 60}%02d"), t))
    // type a: Mondays always 10, Tuesdays always 20 -> eta^2 = 1;
    // type b: each weekday sees both 10 and 20 -> between-SS = 0
    val rows =
      day("2024-01-01", "a", 10) ++ day("2024-01-08", "a", 10) ++
      day("2024-01-02", "a", 20) ++ day("2024-01-09", "a", 20) ++
      day("2024-01-01", "b", 10) ++ day("2024-01-08", "b", 20) ++
      day("2024-01-02", "b", 20) ++ day("2024-01-09", "b", 10)
    val e = rows.map { case (id, ts, t) => (id, ts, t) }
      .toDF("event_id", "ts", "event_type")
    val out = DataChecks.weekdayAnova(e).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("a")._1 == 4L && math.abs(out("a")._2 - 1.0) < 1e-12)
    assert(out("b")._1 == 4L && math.abs(out("b")._2) < 1e-12)
  }

  test("drawdown: deepest fall under the running peak, earliest tie") {
    import spark.implicits._
    val o = Seq(
      ("2024-01-01", 100.0), ("2024-01-02", 150.0),
      ("2024-01-03", 90.0), ("2024-01-04", 120.0))
      .map { case (d, v) => (java.sql.Date.valueOf(d), v) }
      .toDF("o_orderdate", "o_totalprice")
    val r = DataChecks.drawdown(o).collect().head
    assert(r.getDate(0).toString == "2024-01-03")
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      == ((60.0, 150.0, 90.0, 4L)))
  }
}
