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
}
