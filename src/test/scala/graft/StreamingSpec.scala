package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.DataChecks
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("recommended watermark's streamed drops match the audit prediction") {
    implicit val sc = spark.sqlContext
    // arrival order = event_id; lateness vs the running frontier:
    // id3 is 360 s late, id5 90 s, id7 30 s.
    val rows = Seq(
      (1L, "click", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:10:00")),
      (3L, "click", ts("2024-01-01 10:04:00")),
      (4L, "click", ts("2024-01-01 10:12:00")),
      (5L, "click", ts("2024-01-01 10:10:30")),
      (6L, "click", ts("2024-01-01 10:20:00")),
      (7L, "click", ts("2024-01-01 10:19:30")),
      (8L, "click", ts("2024-01-01 10:25:00")))
    // target 150‰ of 8 rows = 1.2: 60 s drops 2 (too many), 300 s
    // drops 1 → recommend 300 s.
    val rec = DataChecks.watermarkRecommendation(
      rows.toDF("event_id", "event_type", "ts"), Seq(60, 300),
      targetPm = 150).collect()
    assert(rec.length == 1)
    val d = rec(0).getAs[Int]("recommended_delay_s")
    val predDropped = rec(0).getAs[Long]("pred_dropped")
    assert(d == 300 && predDropped == 1L)
    // replay the same arrival order through a real watermarked stream,
    // one micro-batch per row so the frontier advances per arrival
    // exactly as the audit models it
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = mem.toDF().toDF("event_id", "event_type", "ts")
      .withWatermark("ts", s"$d seconds")
      .dropDuplicates("event_id", "ts")
      .writeStream.format("memory").queryName("wmrec")
      .outputMode("append").start()
    rows.foreach { r => mem.addData(r); q.processAllAvailable() }
    q.stop()
    assert(rows.size - spark.table("wmrec").count() == predDropped)
  }

  test("streaming heavy hitters: sketch state merges across micro-batches") {
    implicit val sc = spark.sqlContext
    val hot = 100L
    val mem = MemoryStream[Long]
    val q = EventStream.heavyHittersStream(mem.toDF().toDF("k"),
      "k", topN = 3, k = 16)
      .writeStream.format("memory").queryName("hh")
      .outputMode("complete").start()
    // two micro-batches — the second MERGES into the stored sketch,
    // it does not restart it
    mem.addData(Seq.fill(30)(hot) ++ Seq(1L, 2L, 3L): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(20)(hot) ++ Seq(1L, 4L): _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("hh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // 6 distinct keys < k=16 -> the sketch is EXACT over the whole
    // stream-so-far: hot=50 of 55 rows, then the key-1=2 tie by key
    assert(out == List((hot, 50L, 55L), (1L, 2L, 55L), (2L, 1L, 55L)))
  }

  test("streaming CMS grid equals the batch sketch bit-for-bit; " +
      "probe serves from it") {
    implicit val sc = spark.sqlContext
    import graft.operators.Skew
    val mem = MemoryStream[Long]
    val q = EventStream.cmsSketchStream(mem.toDF().toDF("k"), "k")
      .writeStream.format("memory").queryName("cmsgrid")
      .outputMode("complete").start()
    val b1 = Seq.fill(25)(7L) ++ (1L to 40L)
    val b2 = Seq.fill(10)(7L) ++ (30L to 60L)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    def grid(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(x => x)
    val streamed = grid(spark.table("cmsgrid").collect())
    val batch = grid(Skew.cmsSketch((b1 ++ b2).toDF("k"), "k").collect())
    // commutative-sum counters: micro-batch folding == batch partials
    assert(streamed.toSeq == batch.toSeq)
    // serve point estimates from the STREAMED grid: upper bounds that
    // are exact here (61 distinct keys, no full-depth collision), and
    // a never-seen key reads 0 through the left-outer probe
    val keys = Seq(7L, 35L, 999983L).toDF("k")
    val est = Skew.cmsProbe(spark.table("cmsgrid"), keys, "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // key 7: 25 planted + 1 from the 1..40 ramp + 10 planted = 36
    assert(est == Map(7L -> 36L, 35L -> 2L, 999983L -> 0L))
  }

  test("trendingStream: per-window sketches finalize on watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = EventStream.trendingStream(
      mem.toDF().toDF("k", "ts"), "k", "1 hour", "30 minutes", k = 16)
      .writeStream.format("memory").queryName("trend")
      .outputMode("append").start()
    // hour 10: key 7 hot; hour 11: key 9 hot — then advance the
    // watermark past both windows so they finalize
    def at(h: Int, m: Int) = ts(f"2024-01-01 $h%02d:$m%02d:00")
    mem.addData((Seq.fill(5)(7L) :+ 1L).map(x => (x, at(10, 5))): _*)
    mem.addData((Seq.fill(3)(9L) :+ 2L).map(x => (x, at(11, 10))): _*)
    mem.addData((99L, at(13, 0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("trend").collect()
      .map(r => r.getTimestamp(0).toString ->
        ((r.getLong(1), r.getSeq[org.apache.spark.sql.Row](2)
          .map(e => e.getLong(0) -> e.getLong(1)).toMap)))
      .toMap
    // both closed windows emitted exactly once with exact counts
    // (distinct keys < k); the 13:00 window is still open -> absent
    assert(out.keySet == Set("2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0"))
    assert(out("2024-01-01 10:00:00.0") == ((6L, Map(7L -> 5L, 1L -> 1L))))
    assert(out("2024-01-01 11:00:00.0") == ((4L, Map(9L -> 3L, 2L -> 1L))))
  }

  test("streaming windowed counts match the batch transform") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts("2024-01-01 10:05:00"), "click", 1.0),
      Event(2, ts("2024-01-01 10:45:00"), "click", 2.0),
      Event(1, ts("2024-01-01 11:10:00"), "view", 3.0))
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    mem.addData(Event(1, ts("2024-01-01 14:00:00"), "click", 9.0)) // advances watermark
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wc")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("2024-01-01 10:00:00.0", "click")) == 2L)
    assert(out(("2024-01-01 11:00:00.0", "view")) == 1L)
  }

  test("streaming QA flags only windows past tolerance") {
    implicit val sc = spark.sqlContext
    val expected = Seq(("click", 2L), ("view", 1L), ("retired", 0L))
      .toDF("event_type", "expected")
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts("2024-01-01 10:01:00"), "click", 1.0),
      Event(2, ts("2024-01-01 10:02:00"), "click", 1.0),
      Event(3, ts("2024-01-01 10:03:00"), "click", 1.0),
      Event(4, ts("2024-01-01 10:04:00"), "click", 1.0), // 4 clicks vs 2 expected
      Event(5, ts("2024-01-01 10:05:00"), "view", 1.0),  // 1 view vs 1 expected
      Event(6, ts("2024-01-01 10:06:00"), "scroll", 1.0), // unknown type: no flag
      Event(7, ts("2024-01-01 10:07:00"), "retired", 1.0)) // expected 0: must flag
    val q = EventStream.qaExceedances(mem.toDF(), expected, tolerance = 0.5)
      .writeStream.format("memory").queryName("qaflags").outputMode("append").start()
    mem.addData(Event(9, ts("2024-01-01 14:00:00"), "click", 0.0)) // advance watermark
    q.processAllAvailable()
    q.stop()
    val out = spark.table("qaflags").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01 10:00:00.0", "click") -> 4L,
      ("2024-01-01 10:00:00.0", "retired") -> 1L))
  }

  test("sessionization closes sessions after the gap") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), "click", 1.0),
      Event(1, ts("2024-01-01 10:10:00"), "view", 2.0),   // same session (gap 30m)
      Event(1, ts("2024-01-01 12:00:00"), "click", 4.0),  // new session
      Event(2, ts("2024-01-01 10:00:00"), "view", 8.0))
    val q = EventStream.sessionize(spark, mem.toDS(), 30)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // push watermark far ahead so all sessions time out and emit
    mem.addData(Event(3, ts("2024-01-02 00:00:00"), "click", 0.0))
    q.processAllAvailable()
    mem.addData(Event(3, ts("2024-01-03 00:00:00"), "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(out((1L, "2024-01-01 10:00:00.0")) == ((2L, 3.0)))
    assert(out((1L, "2024-01-01 12:00:00.0")) == ((1L, 4.0)))
    assert(out((2L, "2024-01-01 10:00:00.0")) == ((1L, 8.0)))
  }

  test("incremental reach counts each household once, in its first window") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts("2024-01-01 10:00:00"), "view", 1.0),
      Event(2, ts("2024-01-02 10:00:00"), "view", 1.0),
      Event(1, ts("2024-01-09 10:00:00"), "view", 1.0),  // repeat household
      Event(3, ts("2024-01-10 10:00:00"), "view", 1.0))
    val q = EventStream.incrementalReach(spark, mem.toDS())
      .writeStream.format("memory").queryName("inc_reach").outputMode("append").start()
    mem.addData(Event(99, ts("2024-02-01 00:00:00"), "view", 0.0)) // flush watermark
    q.processAllAvailable()
    q.stop()
    val out = spark.table("inc_reach")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // 7-day windows aligned to epoch (Thursday): 2023-12-28 covers Jan 1-3,
    // 2024-01-04 covers Jan 4-10
    assert(out("2023-12-28 00:00:00.0") == 2L)  // households 1, 2
    assert(out("2024-01-04 00:00:00.0") == 1L)  // household 3 only (1 is a repeat)
  }

  test("file-source stream reads the events dir incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val q = EventStream.fromParquetDir(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("fs_counts")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val total = spark.table("fs_counts").agg(sum("n")).collect()(0).getLong(0)
    assert(total == 1000L)
  }

  test("streaming dedup suppresses in-watermark duplicates, keeps first-seen") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    mem.addData(
      (1L, "Hello, World!", ts("2024-01-01 10:00:00")),
      (2L, "hello   world", ts("2024-01-01 10:05:00")), // same fingerprint as 1
      (3L, "a different doc", ts("2024-01-01 10:10:00")))
    val q = EventStream.dedupByFingerprint(
      mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("ddup").outputMode("append").start()
    q.processAllAvailable()
    // a near-identical doc inside the watermark window is still a dup
    mem.addData((4L, "HELLO WORLD?", ts("2024-01-01 10:20:00")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("ddup").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L))
  }

  test("frame sampling strides and caps per-doc frame rows") {
    import spark.implicits._
    // 1-char text → byte_len 1 → n_frames 2 → frames 0 (stride 5 caps)
    // 26-char → n_frames 27 → frames 0,5,10,15 (maxFrames 4 binds)
    val df = Seq((1L, "x"), (2L, "a" * 26)).toDF("doc_id", "text")
    val out = graft.operators.Multimodal.sampleFrames(df, 5, 4).collect()
    assert(out.filter(_.getLong(0) == 1L).map(_.getInt(3)).toSeq == Seq(0))
    assert(out.filter(_.getLong(0) == 2L).map(_.getInt(3)).toSeq ==
      Seq(0, 5, 10, 15))
  }

  test("multimodal decode reads real PNG geometry and pixels back") {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.decodeFeatures(
      spark, Multimodal.syntheticImages(spark, docs)).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      val (w, h) = Multimodal.ImageCodec.geometry(f.doc_id)
      assert(f.width == w && f.height == h && f.bands == 1L)
      assert(f.px_sum == Multimodal.ImageCodec.expectedPxSum(f.doc_id))
    }
  }

  test("dailyActive reconstructs out-of-order days across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // batch 1: user 1 active on day 2 (01:00) — emits dau(d2) and
    // wau targets d2..d8; watermark lands at day-1 23:00, so day 1
    // is NOT yet expired
    mem.addData(Event(1, ts("2024-01-02 01:00:00"), "view", 1.0))
    val q = EventStream.dailyActive(spark, mem.toDS(), 7)
      .writeStream.format("memory").queryName("ooo_da").outputMode("append")
      .start()
    q.processAllAvailable()
    // batch 2: the SAME user's day-1 event arrives late but inside
    // the lateness bound — the covered-target check must emit exactly
    // the targets day 2 didn't cover: dau(d1) + wau(d1) only (targets
    // d2..d7 are already covered by the day-2 emission)
    mem.addData(Event(1, ts("2024-01-01 23:30:00"), "view", 1.0))
    q.processAllAvailable()
    // sentinel finalizes all real windows
    mem.addData(Event(99, ts("2024-02-01 00:00:00"), "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ooo_da").collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out(("2024-01-01", "dau")) == 1 && out(("2024-01-02", "dau")) == 1)
    // one user, counted ONCE per trailing window — a re-expansion bug
    // would count the user twice on days 2..7
    (1 to 7).foreach { d =>
      assert(out((f"2024-01-0$d%d", "wau")) == 1,
        s"day $d window must count the user once")
    }
    assert(out(("2024-01-08", "wau")) == 1,
      "day 8 still inside day 2's trailing window")
    assert(!out.contains(("2024-01-09", "wau")),
      "day 9 is outside both days' windows")
  }

  test("cohortActivity: late earlier-week touch is dropped, not re-cohorted") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // 2024-01-01 and 2024-01-08 are Mondays. user 2: clean two-week
    // history (cohort week Jan 1, active weeks 0 and 1). user 1:
    // first non-late event in week Jan 8 → cohort fixed there.
    mem.addData(
      Event(2, ts("2024-01-01 10:00:00"), "view", 1.0),
      Event(2, ts("2024-01-08 10:00:00"), "view", 1.0),
      Event(1, ts("2024-01-08 01:00:00"), "view", 1.0))
    val q = EventStream.cohortActivity(spark, mem.toDS())
      .writeStream.format("memory").queryName("coh_c").outputMode("append")
      .start()
    q.processAllAvailable()
    // user 1's week-Jan-1 event arrives late but inside the lateness
    // bound (wm = Jan 7 23:00): append mode cannot retract the
    // already-emitted week-Jan-8 cohort row, so the documented
    // contract DROPS it rather than re-cohorting
    mem.addData(Event(1, ts("2024-01-07 23:30:00"), "view", 1.0))
    q.processAllAvailable()
    mem.addData(Event(99, ts("2024-03-01 00:00:00"), "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("coh_c").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(out(("2024-01-01", 0)) == 1, "user 2 anchors cohort week 1")
    assert(out(("2024-01-01", 1)) == 1, "user 2 retained in week 2")
    assert(out(("2024-01-08", 0)) == 1, "user 1 cohorts at first non-late week")
    // the dropped touch must not create a week-1 cohort cell for
    // user 1 or bump any existing cell
    assert(out.values.forall(_ == 1) && out.size == 3, out.toString)
  }

  test("streaming anomaly alerts match the batch flags on finalized days") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // 9 quiet days (2/3 events alternating), then a 50-event spike on
    // day 10; a sentinel on day 12 advances the watermark past day 10
    val quiet = (1 to 9).flatMap { d =>
      val n = if (d % 2 == 0) 2 else 3
      (1 to n).map(i => Event(i, ts(f"2024-01-0$d%d 0$i%d:00:00"), "t", 1.0))
    }
    val spike = (1 to 50).map(i =>
      Event(i, ts("2024-01-10 05:00:00"), "t", 1.0))
    mem.addData(quiet ++ spike: _*)
    val q = EventStream.anomalyAlerts(spark, mem.toDS())
      .writeStream.format("memory").queryName("anom").outputMode("append")
      .start()
    mem.addData(Event(99, ts("2024-01-12 00:00:00"), "t", 0.0))
    q.processAllAvailable()
    // a straggler for the already-finalized day 10 must NOT re-open
    // and re-emit it (flatMapGroupsWithState delivers late rows)
    mem.addData(Event(98, ts("2024-01-10 06:00:00"), "t", 0.0))
    mem.addData(Event(97, ts("2024-01-12 01:00:00"), "t", 0.0))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("anom").groupBy("day_num").count()
      .where(col("count") > 1).count() == 0, "no day emitted twice")
    val streamed = spark.table("anom").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5))).toMap
    val day10 = java.time.LocalDate.of(2024, 1, 10).toEpochDay
    assert(streamed.keySet == (day10 - 9 to day10).toSet,
      "all ten event days finalized, sentinel day still open")
    assert(streamed(day10)._4, "spike day flags")
    assert(streamed.filterNot(_._1 == day10).values.forall(!_._4),
      "quiet and warmup days never flag")
    // exact equivalence with the batch operator on the finalized days
    val batchIn = (quiet ++ spike).toDF()
    val batch = graft.operators.DataChecks.anomalyFlags(batchIn)
      .withColumn("day_num",
        datediff(col("date"), lit("1970-01-01")).cast("long"))
      .collect()
      .map(r => r.getAs[Long]("day_num") -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(streamed == batch, "streamed alerts equal batch flags")
  }

  test("streaming EWMA alerts match the batch spike flags on finalized days") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // rising quiet days then a spike: the EWMA baseline tracks the
    // rise, so only the genuine spike flags
    val quiet = (1 to 9).flatMap { d =>
      val n = if (d % 2 == 0) 2 else 3
      (1 to n).map(i => Event(i, ts(f"2024-01-0$d%d 0$i%d:00:00"), "t", 1.0))
    }
    val spike = (1 to 50).map(i =>
      Event(i, ts("2024-01-10 05:00:00"), "t", 1.0))
    mem.addData(quiet ++ spike: _*)
    val q = EventStream.ewmaAlerts(spark, mem.toDS())
      .writeStream.format("memory").queryName("ewma_a").outputMode("append")
      .start()
    mem.addData(Event(99, ts("2024-01-12 00:00:00"), "t", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ewma_a").collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getBoolean(5)))).toMap
    val day10 = java.time.LocalDate.of(2024, 1, 10).toEpochDay
    assert(streamed(day10)._4, "spike day flags")
    assert(streamed.filterNot(_._1 == day10).values.forall(!_._4))
    val batch = graft.operators.DataChecks.ewmaAnomaly((quiet ++ spike).toDF())
      .withColumn("day_num",
        datediff(col("date"), lit("1970-01-01")).cast("long"))
      .collect()
      .map(r => r.getAs[Long]("day_num") -> ((r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getBoolean(5)))).toMap
    assert(streamed == batch, "streamed EWMA alerts equal batch flags")
  }
}
