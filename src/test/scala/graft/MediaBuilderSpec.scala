package graft

import org.apache.spark.sql.functions._
import graft.operators.MediaBuilder

class MediaBuilderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tv = Seq((1L, "tv", "2024-01-01"), (2L, "tv", "2024-01-02"))
    .toDF("household_id", "etype", "date")
  private lazy val web = Seq((1L, "web", "2024-01-01"))
    .toDF("household_id", "etype", "date")
  private lazy val proj = Seq((1L, 2.0), (2L, 3.0), (1L, 2.0))
    .toDF("household_id", "projfact")

  test("makeMedia joins deduped projection factors onto the union") {
    val m = MediaBuilder.makeMedia(Seq(tv, web), "etype", proj, None)
    assert(m.count() == 3)
    val pf = m.where(col("household_id") === 1L)
      .select("projfact").as[Double].collect().toSet
    assert(pf == Set(2.0))
  }

  test("makeMedia rescales by the etype ratio for non-etype dims") {
    val ratio = Seq(("tv", 2.0), ("web", 10.0)).toDF("etype", "ratio")
    val m = MediaBuilder.makeMedia(Seq(tv, web), "date", proj, Some(ratio))
    val sums = m.groupBy("household_id").agg(sum("projfact").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hh1: tv 2*2 + web 2*10 = 24 ; hh2: tv 3*2 = 6
    assert(sums == Map(1L -> 24.0, 2L -> 6.0))
  }

  test("makeMedia rejects frames missing the dimension") {
    val e = intercept[IllegalArgumentException] {
      MediaBuilder.makeMedia(Seq(tv.drop("date")), "date", proj, None)
    }
    assert(e.getMessage.contains("date"))
  }
}
