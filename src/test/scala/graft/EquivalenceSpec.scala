package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Analytics
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** The streaming windowed aggregation must produce the same numbers as
  * its batch twin over the real sf0.001 events table. */
class EquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts equal batch eventWindows on sf0.001") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val maxTs = ev.map(_.ts.getTime).max

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("eq_wc").outputMode("append").start()
    // sentinel far past the watermark flushes every real window
    val sentinel = Event(0L, new Timestamp(maxTs + 10 * 3600 * 1000L), "sentinel", 0.0)
    mem.addData(sentinel)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("eq_wc")
      .where(col("event_type") =!= "sentinel")
      .select(col("window_start"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Analytics.eventWindows(Tables.events(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming U-shaped and time-decay credits equal the batch attribution") {
    import graft.streaming.EventStream.TouchEvent
    val windowDays = 3
    val evDf = Tables.events(spark, "/root/testdata/sf0.001")
    val ev = evDf
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[TouchEvent].collect().toSeq
    val maxTs = ev.map(_.ts.getTime).max

    implicit val sc = spark.sqlContext
    def runTwin(name: String,
                twin: org.apache.spark.sql.Dataset[TouchEvent] =>
                  org.apache.spark.sql.Dataset[EventStream.AttributionCredit])
        : Map[String, (Long, Double)] = {
      val mem = MemoryStream[TouchEvent]
      mem.addData(ev: _*)
      val q = twin(mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      // sentinel far past every purchase finalizes all windows (a
      // non-purchase type after all purchases is a touch no backward
      // window can ever reach)
      mem.addData(TouchEvent(0L,
        new Timestamp(maxTs + 10 * 86400000L), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      q.stop()
      // per-channel report from the per-purchase credit rows — the
      // batch aggregate replayed over the emitted integer micro-cents
      spark.table(name)
        .groupBy(col("channel"))
        .agg(sum(col("k")).as("n_credits"),
          (sum(col("credit_micro")).cast("double") / 100000000.0)
            .as("credited_value"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    }

    val streamedU = runTwin("eq_attr_u",
      EventStream.uShapedCredits(_, windowDays))
    val batchU = graft.operators.Temporal.attributionUShaped(evDf, windowDays)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(batchU.nonEmpty && batchU.keySet != Set("(none)"))
    assert(streamedU == batchU,
      s"U-shaped: streamed $streamedU vs batch $batchU")

    val streamedD = runTwin("eq_attr_d",
      EventStream.decayCredits(_, windowDays))
    val batchD = graft.operators.Temporal.attributionDecay(evDf, windowDays)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(batchD.nonEmpty && batchD.keySet != Set("(none)"))
    assert(streamedD == batchD,
      s"decay: streamed $streamedD vs batch $batchD")

    // first/last twin: its finisher reshapes the k-tagged credit rows
    // back into the four-column batch report
    val memFl = MemoryStream[TouchEvent]
    memFl.addData(ev: _*)
    val qFl = EventStream.flCredits(memFl.toDS(), windowDays)
      .writeStream.format("memory").queryName("eq_attr_fl")
      .outputMode("append").start()
    memFl.addData(TouchEvent(0L,
      new Timestamp(maxTs + 10 * 86400000L), -1L, "sentinel", 0.0))
    qFl.processAllAvailable()
    qFl.stop()
    def flKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))).toMap
    val streamedFl = flKey(graft.operators.Temporal
      .attributionFlFromCredits(spark.table("eq_attr_fl")))
    val batchFl = flKey(graft.operators.Temporal
      .attributionFirstLast(evDf, windowDays))
    assert(batchFl.nonEmpty && batchFl.keySet != Set("(none)"))
    assert(streamedFl == batchFl,
      s"first/last: streamed $streamedFl vs batch $batchFl")
  }

  test("streaming daily type counts + finisher equal batch freshness") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.dailyTypeCounts(mem.toDF())
      .writeStream.format("memory").queryName("eq_fresh")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val snap = spark.table("eq_fresh")
      .as[(String, java.sql.Date, Long, Long)].collect().toSeq
      .toDF("event_type", "day", "n", "max_us")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        r.getTimestamp(2).getTime, r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    val streamed = key(graft.operators.DataChecks
      .freshnessFromDaily(snap, Seq(1, 7)))
    val batch = key(graft.operators.DataChecks
      .freshness(Tables.events(spark, "/root/testdata/sf0.001")))
    assert(batch.nonEmpty)
    assert(streamed == batch, "finisher over streamed grid == batch")
  }

  test("streaming hour error counts + Wilson finisher equal batch") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.hourErrorCounts(mem.toDF())
      .writeStream.format("memory").queryName("eq_errshare")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val snap = spark.table("eq_errshare")
      .as[(Int, Long, Long)].collect().toSeq
      .toDF("hod", "n_events", "n_errors")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val streamed = key(graft.operators.DataChecks
      .errorShareFromCounts(snap, 1.96))
    val batch = key(graft.operators.DataChecks
      .errorShare(Tables.events(spark, "/root/testdata/sf0.001")))
    assert(batch.nonEmpty && batch.values.exists(_._2 > 0))
    assert(streamed == batch, "finisher over streamed grid == batch")
  }

  test("streaming Benford digit counts + batch finisher equal benfordQa") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    // Complete mode: state IS the types×9 count grid, republished each
    // micro-batch — no watermark/finalization dance needed
    val q = EventStream.digitCounts(mem.toDF())
      .writeStream.format("memory").queryName("eq_benford")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    // snapshot the sink: the finisher self-joins its input (spine ×
    // counts) and the streaming MemoryPlan view trips analyzer
    // reference-dedup when both sides are the same sink view
    val countsSnap = spark.table("eq_benford")
      .as[(String, Int, Long)].collect().toSeq
      .toDF("event_type", "digit", "nd")
    val streamed = graft.operators.DataChecks
      .benfordFromCounts(countsSnap, 20.09)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(5), r.getBoolean(6)))).toMap
    val batch = graft.operators.DataChecks
      .benfordQa(Tables.events(spark, "/root/testdata/sf0.001"), 20.09)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(5), r.getBoolean(6)))).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch, "finisher over streamed counts == batch report")
  }

  test("streaming canary scan and PII redaction equal their batch twins") {
    val phrases = Seq("agg join small", "table window table", "never present")
    val planted = graft.operators.Privacy.plantPii(
      Tables.documents(spark, "/root/testdata/sf0.001"))
      .select(col("doc_id"), col("text"))
    val rows = planted.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val qc = EventStream.canaryScanStream(
      mem.toDF().toDF("doc_id", "text"), phrases)
      .writeStream.format("memory").queryName("eq_canary")
      .outputMode("append").start()
    qc.processAllAvailable()
    qc.stop()
    val streamedC = spark.table("eq_canary").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batchC = graft.operators.Curation.canaryScan(planted, phrases)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streamedC == batchC && batchC.exists(_._2 != 0L))

    val mem2 = MemoryStream[(Long, String)]
    mem2.addData(rows: _*)
    val qp = EventStream.piiRedactStream(mem2.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("eq_pii")
      .outputMode("append").start()
    qp.processAllAvailable()
    qp.stop()
    val streamedP = spark.table("eq_pii").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getString(5))).sorted.toSeq
    val batchP = graft.operators.Privacy.piiRedact(planted)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getString(5)))
      .sorted.toSeq
    assert(streamedP == batchP && batchP.exists(_._2 > 0L))
  }

  test("streaming quality filter equals the batch verdicts") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(rows: _*)
    val q = EventStream.qualityFilterStream(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("eq_qf")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eq_qf").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val batch = graft.operators.TextAnalysis.qualityFilter(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sorted.toSeq
    assert(streamed == batch)
    // both verdict classes must actually occur or the test proves
    // nothing about the reason chain
    assert(batch.exists(_._2 == 1) && batch.exists(_._2 == 0))
  }

  test("streaming dailyActive(30) + ratio finisher equal batch stickiness") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val maxTs = ev.map(_.ts.getTime).max
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.dailyActive(spark, mem.toDS(), 30)
      .writeStream.format("memory").queryName("eq_stick")
      .outputMode("append").start()
    // 35 days past the last event closes every 30-day trailing window
    mem.addData(Event(0L,
      new Timestamp(maxTs + 35 * 86400000L), "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val streamed = key(graft.operators.Journey
      .stickinessFromDaily(spark.table("eq_stick")))
    val batch = key(graft.operators.Journey
      .stickiness(Tables.events(spark, "/root/testdata/sf0.001"), 30))
    assert(batch.nonEmpty)
    batch.foreach { case (day, v) =>
      assert(streamed.get(day).contains(v),
        s"$day: streamed ${streamed.get(day)} vs batch $v")
    }
  }

  test("streaming dailyActive equals batch activeUsers on finalized days") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val maxTs = ev.map(_.ts.getTime).max

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.dailyActive(spark, mem.toDS(), 7)
      .writeStream.format("memory").queryName("eq_da").outputMode("append")
      .start()
    // sentinel far past the watermark finalizes every real day window
    // (10 days so even the last day's trailing targets close)
    mem.addData(Event(0L,
      new Timestamp(maxTs + 10 * 86400000L), "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("eq_da").collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = graft.operators.Journey
      .activeUsers(Tables.events(spark, "/root/testdata/sf0.001"), 7)
      .collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(batch.nonEmpty)
    // every batch day (days with own-day activity) must match exactly
    // on both legs; streaming also emits trailing ghost-day wau rows
    // the batch pair's inner join drops — those aren't compared
    batch.foreach { case (day, (dau, wau)) =>
      assert(streamed.get((day, "dau")).contains(dau),
        s"$day dau: streamed ${streamed.get((day, "dau"))} vs batch $dau")
      assert(streamed.get((day, "wau")).contains(wau),
        s"$day wau: streamed ${streamed.get((day, "wau"))} vs batch $wau")
    }
  }

  test("streaming cohortActivity equals the batch retention triangle") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val maxTs = ev.map(_.ts.getTime).max

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.cohortActivity(spark, mem.toDS())
      .writeStream.format("memory").queryName("eq_co").outputMode("append")
      .start()
    // sentinel 3 weeks past the data finalizes every real week window
    mem.addData(Event(0L,
      new Timestamp(maxTs + 21 * 86400000L), "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("eq_co").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
      .toMap
    val batch = graft.operators.Journey
      .cohortRetention(Tables.events(spark, "/root/testdata/sf0.001"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(batch.nonEmpty)
    // the sentinel user adds its own 1-user cohort; every BATCH cell
    // must be reproduced exactly by the stream
    batch.foreach { case (cell, n) =>
      assert(streamed.get(cell).contains(n),
        s"cohort cell $cell: streamed ${streamed.get(cell)} vs batch $n")
    }
  }

  test("streaming lifecycleStatus equals the batch active statuses") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val maxTs = ev.map(_.ts.getTime).max

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.lifecycleStatus(spark, mem.toDS())
      .writeStream.format("memory").queryName("eq_lc").outputMode("append")
      .start()
    mem.addData(Event(0L,
      new Timestamp(maxTs + 21 * 86400000L), "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("eq_lc").collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = graft.operators.Journey
      .lifecycle(Tables.events(spark, "/root/testdata/sf0.001"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(batch.nonEmpty)
    // churned is batch-only (needs a closed corpus or timers — see
    // scaladoc); the sentinel user adds one week-of-sentinel 'new'
    // row outside the batch frame. Every batch ACTIVE cell must be
    // reproduced exactly; user 0's real first week stays 'new' since
    // the sentinel week is strictly later.
    batch.filterNot(_._1._2 == "churned").foreach { case (cell, n) =>
      assert(streamed.get(cell).contains(n),
        s"lifecycle cell $cell: streamed ${streamed.get(cell)} vs batch $n")
    }
  }

  test("streaming transitionCounts sums to the batch next-event matrix") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val maxTs = ev.map(_.ts.getTime).max

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.transitionCounts(spark, mem.toDS())
      .writeStream.format("memory").queryName("eq_ne").outputMode("append")
      .start()
    // sentinel far past the watermark finalizes every real day
    mem.addData(Event(0L,
      new Timestamp(maxTs + 10 * 86400000L), "sentinel", 0.0))
    q.processAllAvailable()
    q.stop()

    // user 0's last real event chains into the sentinel — exclude it
    val streamed = spark.table("eq_ne")
      .where(col("to_type") =!= "sentinel")
      .groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n")).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.Journey
      .nextEventMatrix(Tables.events(spark, "/root/testdata/sf0.001"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming funnelProgress sums to the batch funnel stage counts") {
    val stages = Seq("view", "click", "purchase")
    // same sparse slice the batch funnel queries use
    val sliced = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") % 13 === 0)
    val ev = sliced
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val maxTs = ev.map(_.ts.getTime).max

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.funnelProgress(spark, mem.toDS(), stages)
      .writeStream.format("memory").queryName("eq_fp").outputMode("append")
      .start()
    // finalization follows the TOUCH stream's watermark (see the
    // operator scaladoc), so the flush sentinel must COMPLETE a stage:
    // a far-future stage-0 view from a user id outside the corpus
    mem.addData(Event(999999L,
      new Timestamp(maxTs + 10 * 86400000L), "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val lastRealDay = new java.sql.Date(maxTs).toString
    val streamed = spark.table("eq_fp")
      .where(col("day") <= lastRealDay) // drop the sentinel's own touch
      .groupBy(col("stage")).agg(sum(col("n_users")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Journey.funnelSteps(sliced, stages)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(batch.nonEmpty && batch("view") > 0)
    assert(streamed == batch.filter(_._2 > 0))
  }

  test("windowed funnelProgress sums to the batch windowed funnel") {
    val stages = Seq("view", "click", "purchase")
    // 7 days BINDS on the sf0.001 slice (purchase 1 -> 0 vs the
    // unbounded funnel; the gate's 14-day constant only binds at
    // sf0.01+), which is what makes this twin prove the deadline path
    val windowDays = 7
    val sliced = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") % 13 === 0)
    val ev = sliced
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val maxTs = ev.map(_.ts.getTime).max

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev: _*)
    val q = EventStream.funnelProgress(spark, mem.toDS(), stages,
      Some(windowDays * 86400L * 1000000L))
      .writeStream.format("memory").queryName("eq_fw").outputMode("append")
      .start()
    mem.addData(Event(999999L,
      new Timestamp(maxTs + 10 * 86400000L), "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val lastRealDay = new java.sql.Date(maxTs).toString
    val streamed = spark.table("eq_fw")
      .where(col("day") <= lastRealDay)
      .groupBy(col("stage")).agg(sum(col("n_users")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Journey
      .funnelWindowed(sliced, stages, windowDays)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(batch.nonEmpty && batch("view") > 0)
    // the deadline must BIND vs the unbounded funnel, or this proves
    // nothing beyond the other twin
    val unbounded = graft.operators.Journey.funnelSteps(sliced, stages)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(stages.exists(st => batch(st) < unbounded(st)))
    assert(streamed == batch.filter(_._2 > 0))
  }

  test("streaming dedup keeps exactly the batch exactDedup survivors") {
    // the sf0.001 planted dups are NEAR dups only — plant one exact
    // duplicate (new id, same text as doc 0) so the dedup binds
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val docs = base :+ (9001L -> base.head._2)
    val docsDf = docs.toDF("doc_id", "text")
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    // id-ordered arrival, all inside one watermark window → streaming
    // first-seen == batch min-doc_id survivor for every fingerprint
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    mem.addData(docs.map { case (id, tx) => (id, tx, t0) }: _*)
    val q = EventStream.dedupByFingerprint(
      mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("eq_dd").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eq_dd").collect().map(_.getLong(0)).toSet
    val batch = graft.operators.TextAnalysis.exactDedup(docsDf)
      .where(col("is_dup") === 0).collect().map(_.getLong(0)).toSet
    assert(streamed == batch)
    assert(batch.size == docs.size - 1, "exactly the planted dup dropped")
  }

  test("streaming near-dup probe equals batch dedupIncrement verdicts") {
    import graft.operators.NearDup
    // slice sf0.001 docs into corpus + increment, then plant one exact
    // and one near duplicate of a corpus doc in the increment so both
    // match kinds bind (the natural slice may have no cross-slice dups)
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val corpusRows = base.filter(_._1 % 10 != 3)
    val donor = corpusRows.find(_._2.split(" ").length > 50).get
    val nearText = donor._2.split(" ").zipWithIndex
      .map { case (w, i) => if (i % 17 == 0) w + "x" else w }.mkString(" ")
    val incRows = base.filter(_._1 % 10 == 3) ++
      Seq(900001L -> donor._2, 900002L -> nearText)
    val corpus = corpusRows.toDF("doc_id", "text")
    val inc = incRows.toDF("doc_id", "text")

    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val batch = NearDup.dedupIncrement(inc, corpus).collect()
      .map(r => (r.getLong(0), opt(r, 1), opt(r, 2), r.getBoolean(3))).toSet
    assert(batch.exists(v => v._2.isDefined), "planted exact dup must bind")
    assert(batch.exists(v => v._2.isEmpty && v._3.isDefined),
      "planted near dup must bind through the LSH path")

    implicit val sc = spark.sqlContext
    val idx = NearDup.buildIncrementIndex(corpus)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    mem.addData(incRows.map { case (id, tx) => (id, tx, t0) }: _*)
    val q = EventStream.nearDupProbe(
      mem.toDF().toDF("doc_id", "text", "ts"), idx)
      .writeStream.format("memory").queryName("eq_ndp")
      .outputMode("append").start()
    q.processAllAvailable()
    // sentinel far past the watermark finalizes the real window
    mem.addData((999999L, "sentinel doc",
      new Timestamp(t0.getTime + 10L * 3600 * 1000)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eq_ndp")
      .where(col("doc_id") =!= 999999L)
      .collect().map(r => (r.getLong(1), opt(r, 2), opt(r, 3), r.getBoolean(4)))
      .toSet
    assert(streamed == batch)
    idx.release()
  }

  test("freshNearDupProbe rebuilds a stale snapshot before streaming; the frozen snapshot provably misses") {
    import graft.operators.NearDup
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    val prefix = "graft_dedup_stream_fresh"
    val corpus = docs(10L -> (1 to 30).map(i => s"w$i").mkString(" "),
      11L -> "an unrelated corpus document here")
    NearDup.publishIncrementIndex(corpus, prefix = prefix)
    // live corpus grows past the staleness threshold with a NEW family
    val grown = corpus.unionAll(
      docs(12L -> (1 to 30).map(i => s"q$i").mkString(" "))
        .select(corpus.columns.map(col): _*))
    val probeText = (1 to 28).map(i => s"q$i").mkString(" ") + " tail changed"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def streamVerdict(df: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                      name: String): org.apache.spark.sql.Row = {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, java.sql.Timestamp)]
      mem.addData((20L, probeText, t0))
      val q = df(mem.toDF().toDF("doc_id", "text", "ts"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable()
      mem.addData((999999L, "sentinel doc",
        new java.sql.Timestamp(t0.getTime + 10L * 3600 * 1000)))
      q.processAllAvailable()
      q.stop()
      spark.table(name).where(col("doc_id") === 20L).collect().head
    }
    // the frozen snapshot misses the near-dup of the new doc — the
    // silent under-flagging hazard, streamed
    val stale = streamVerdict(s => graft.streaming.EventStream
      .nearDupProbe(s, NearDup.loadIncrementIndex(spark, prefix = prefix)),
      "eq_fresh_stale")
    assert(stale.getBoolean(4), "frozen snapshot must miss (is_new=true)")
    // the staleness-aware path consults the verdict, rebuilds, and the
    // SAME streamed probe now catches the near-dup
    val fresh = streamVerdict(s => graft.streaming.EventStream
      .freshNearDupProbe(s, grown, prefix = prefix), "eq_fresh_rebuilt")
    assert(!fresh.getBoolean(4) && fresh.getLong(3) == 12L,
      "rebuilt snapshot must flag the near-dup of the new corpus doc")
    // and the rebuild REPUBLISHED: a plain load now serves the fresh set
    assert(spark.table(NearDup.fpTable(prefix)).count() == 3)
    Seq(NearDup.fpTable(prefix), NearDup.bucketsTable(prefix),
      NearDup.sigsTable(prefix)).foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("publishStream appends each micro-batch to a catalog table") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pub").toString
    spark.sql("DROP TABLE IF EXISTS graft_stream_pub")
    mem.addData((1L, "a"), (2L, "b"))
    val q = EventStream.publishStream(
      mem.toDF().toDF("id", "v"), "graft_stream_pub", ckpt)
    q.processAllAvailable()
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("graft_stream_pub").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    // foreachBatch is at-least-once: replaying a micro-batch with its
    // original batchId (retry after a failure mid-append) must
    // overwrite that batch's partition, not append a second copy
    import spark.implicits._
    EventStream.publishBatch(
      Seq((3L, "c")).toDF("id", "v"), "graft_stream_pub", 1L)
    val after = spark.table("graft_stream_pub")
    assert(after.count() == 3, "replayed batch must not duplicate rows")
    assert(after.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    spark.sql("DROP TABLE graft_stream_pub")
  }

  test("best-copy dedup partitions groups exactly like min-id dedup") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val byMin = TextAnalysis.exactDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap        // doc -> rep
    val byBest = TextAnalysis.exactDedupBest(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap        // doc -> best
    assert(byMin.keySet == byBest.keySet)
    // identical group partition: two docs share a min-id rep iff they
    // share a best-quality rep — only WHICH member represents differs
    val groupsMin = byMin.groupBy(_._2).values.map(_.keySet).toSet
    val groupsBest = byBest.groupBy(_._2).values.map(_.keySet).toSet
    assert(groupsMin == groupsBest)
    // and each best rep belongs to its own group
    assert(byBest.forall { case (_, rep) => byBest(rep) == rep })
  }
}
