package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Privacy, Temporal}

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("kmRepurchase: product-limit curve with right-censoring") {
    // segment A: c1/c4 repurchase at gap 2, c2 at gap 4, c3 never
    // (censored at the frontier 2024-01-11, gap 10, after both event
    // times -> at risk at both). c1's THIRD order must not matter.
    // segment B: c5 single order at the frontier -> censored, no rows.
    // KM: t=2 n=4 d=2 S=0.5; t=4 n=2 d=1 S=0.25.
    val o = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-03"), (1L, "2024-01-10"),
      (2L, "2024-01-01"), (2L, "2024-01-05"),
      (3L, "2024-01-01"),
      (4L, "2024-01-01"), (4L, "2024-01-03"),
      (5L, "2024-01-11"))
      .map { case (c, d) => (c, Timestamp.valueOf(d + " 00:00:00")) }
      .toDF("o_custkey", "o_orderdate")
    val cust = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"), (5L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val out = Analytics.kmRepurchase(o, cust).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
    assert(out.toSeq == Seq(
      ("A", 2L) -> ((2L, 4L, 0.5)),
      ("A", 4L) -> ((1L, 2L, 0.25))))
  }

  test("ltvDeciles: deterministic tile cut, cent-exact shares") {
    // 4 customers in segment A with revenues 1/2/3/4 -> ntile(10) puts
    // one customer per tile 1..4 (first tiles get the extras only when
    // n > tiles); shares 0.1/0.2/0.3/0.4, cum 0.1/0.3/0.6/1.0.
    val o = Seq((1L, 1.0), (2L, 2.0), (3L, 1.5), (3L, 1.5), (4L, 4.0))
      .toDF("o_custkey", "o_totalprice")
    val cust = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"))
      .toDF("c_custkey", "c_mktsegment")
    val out = Analytics.ltvDeciles(o, cust).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    assert(out.toSeq == Seq(
      ("A", 1L) -> ((1L, 1.0, 0.1, 0.1)),
      ("A", 2L) -> ((1L, 2.0, 0.2, 0.3)),
      ("A", 3L) -> ((1L, 3.0, 0.3, 0.6)),
      ("A", 4L) -> ((1L, 4.0, 0.4, 1.0))))
  }

  test("segmentMigration: banded transition cells with h1-row shares") {
    // span 2024-01-01..01-11 -> mid = 01-06 (lo + 10/2), h1 inclusive
    def d(s: String) = Date.valueOf(s)
    val orders = Seq(
      (1L, d("2024-01-01")), (1L, d("2024-01-10")),   // light -> light
      (2L, d("2024-01-02")), (2L, d("2024-01-03")), (2L, d("2024-01-06")),
      (3L, d("2024-01-07")), (3L, d("2024-01-08")), (3L, d("2024-01-09")),
      (3L, d("2024-01-10")), (3L, d("2024-01-11")),   // absent -> heavy
      (4L, d("2024-01-04"))                           // light -> absent
    ).toDF("o_custkey", "o_orderdate")
    val out = Analytics.segmentMigration(orders).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3))))
    assert(out.toSeq == Seq(
      ("absent", "heavy") -> ((1L, 1.0)),
      ("light", "absent") -> ((1L, 0.5)),
      ("light", "light") -> ((1L, 0.5)),
      ("regular", "absent") -> ((1L, 1.0))))
  }

  test("orderCompletion: straggler line sets the order's time") {
    def d(s: String) = Date.valueOf(s)
    val orders = Seq((1L, d("2024-01-01"), "1-URGENT"),
      (2L, d("2024-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, d("2024-01-02")), (1L, d("2024-01-09")),  // completes day 8
      (2L, d("2024-01-03")))                         // completes day 2
      .toDF("l_orderkey", "l_shipdate")
    val out = Analytics.orderCompletion(li, orders).collect().head
    // gaps {2, 8}: mean 5, interpolated quartiles 3.5/5/6.5
    assert((out.getString(0), out.getLong(1), out.getDouble(2),
      out.getDouble(3), out.getDouble(4), out.getDouble(5)) ==
      (("1-URGENT", 2L, 5.0, 3.5, 5.0, 6.5)))
  }

  test("fulfillmentLatency: grid quartiles of order->ship day gaps") {
    def d(s: String) = Date.valueOf(s)
    val orders = Seq(
      (1L, d("2024-01-01"), "1-URGENT"),
      (2L, d("2024-02-01"), null))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, d("2024-01-03")), (1L, d("2024-01-05")), (1L, d("2024-01-07")),
      (2L, d("2024-02-11")))
      .toDF("l_orderkey", "l_shipdate")
    val out = Analytics.fulfillmentLatency(li, orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // urgent gaps {2,4,6}: interpolated quartiles 3/4/5, mean 4
    assert(out("1-URGENT") == ((3L, 4.0, 3.0, 4.0, 5.0)))
    // NULL priority coalesces to '' (the row-2i contract)
    assert(out("") == ((1L, 10.0, 10.0, 10.0, 10.0)))
  }

  test("returnTrend: rate vs revenue share diverge on skewed returns") {
    def d(s: String) = Date.valueOf(s)
    val li = Seq(
      (d("2024-01-10"), 10.0, "R"), (d("2024-01-20"), 90.0, "N"),
      (d("2024-04-10"), 50.0, "N"), (d("2024-04-20"), 50.0, "R"))
      .toDF("l_shipdate", "l_extendedprice", "l_returnflag")
    val out = Analytics.returnTrend(li).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // Q1: half the lines but only 10% of the money came back
    assert(out("2024-01-01") == ((2L, 1L, 10000L, 1000L, 0.5, 0.1)))
    assert(out("2024-04-01") == ((2L, 1L, 10000L, 5000L, 0.5, 0.5)))
  }

  test("aovTrend: exact per-quarter AOV, two-point fit is exact") {
    def d(s: String) = Date.valueOf(s)
    val orders = Seq(
      (d("2024-01-10"), 10.0), (d("2024-01-20"), 20.0),  // Q1 aov 15
      (d("2024-04-10"), 25.0))                           // Q2 aov 25
      .toDF("o_orderdate", "o_totalprice")
    val out = Analytics.aovTrend(orders).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("2024-01-01")._1 == 2L && out("2024-01-01")._2 == 15.0)
    assert(out("2024-04-01")._1 == 1L && out("2024-04-01")._2 == 25.0)
    // slope through (1,15),(2,25) = 10, r2 = 1 (two-point exact)
    assert(out("2024-01-01")._3 == 10.0 && out("2024-01-01")._4 == 1.0)
  }

  test("priorityMix: in-quarter vs overall composition drift") {
    def d(s: String) = Date.valueOf(s)
    val orders = Seq(
      (d("2024-01-10"), "1-URGENT"), (d("2024-01-20"), "5-LOW"),
      (d("2024-04-10"), "1-URGENT"), (d("2024-04-20"), "1-URGENT"))
      .toDF("o_orderdate", "o_orderpriority")
    val out = Analytics.priorityMix(orders).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // urgent overall 3/4; Q1 half urgent, Q2 all urgent
    assert(out(("2024-01-01", "1-URGENT")) == ((1L, 0.5, 0.75, -0.25)))
    assert(out(("2024-04-01", "1-URGENT")) == ((2L, 1.0, 0.75, 0.25)))
    assert(out(("2024-01-01", "5-LOW")) == ((1L, 0.5, 0.25, 0.25)))
  }

  test("trafficHeatmap: ISO weekday cells with dual shares") {
    import java.sql.Timestamp
    val events = Seq(
      "2024-01-01 09:00:00", "2024-01-01 09:30:00",  // Mon 9: 2
      "2024-01-01 15:00:00",                         // Mon 15: 1
      "2024-01-07 09:00:00")                         // Sun 9: 1
      .map(Timestamp.valueOf).toDF("ts")
    val out = Analytics.trafficHeatmap(events).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out((1, 9)) == ((2L, 0.5, 2.0 / 3)))
    assert(out((1, 15)) == ((1L, 0.25, 1.0 / 3)))
    assert(out((7, 9)) == ((1L, 0.25, 1.0)))
  }

  test("supplierConsistency: variance ranks, constant supplier last") {
    def d(s: String) = Date.valueOf(s)
    val orders = Seq((1L, d("2024-01-01")), (2L, d("2024-02-01")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, 10L, d("2024-01-03")), (2L, 10L, d("2024-02-03")),  // lags 2,2
      (1L, 20L, d("2024-01-02")), (2L, 20L, d("2024-02-11")))  // lags 1,10
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val out = Analytics.supplierConsistency(li, orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    // s20 var = ((2*101)-121)/2 = 40.5 -> std 6.363961...; s10 var 0
    assert(out.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq((20L, 2L, 5.5), (10L, 2L, 2.0)))
    assert(out(0)._4 == math.floor(math.sqrt(40.5) * 1e6 + 0.5).toLong)
    assert(out(1)._4 == 0L)
  }

  test("brandAffinity: in-order pair support and lift") {
    val part = Seq((1L, "A"), (2L, "B"), (3L, "A"))
      .toDF("p_partkey", "p_brand")
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.brandAffinity(li, part).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    // orders: {A,B}, {A}, {B} -> pair (A,B) co 1; A in 2, B in 2 of 3
    assert(out == Map(("A", "B") ->
      ((1L, 2L, 2L, 3L, 1.0 / 3, 3.0 / 4.0))))
  }

  test("lateReturns: threshold bands, boundary days stay in-band") {
    def d(s: String) = Date.valueOf(s)
    val orders = Seq((1L, d("2024-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, d("2024-01-05"), "R"),   // lag 4 -> 0-7, returned
      (1L, d("2024-01-08"), "N"),   // lag 7 -> boundary stays 0-7
      (1L, d("2024-01-20"), "N"))   // lag 19 -> 8-30
      .toDF("l_orderkey", "l_shipdate", "l_returnflag")
    val out = Analytics.lateReturns(li, orders).collect()
      .map(r => r.getString(1) -> ((r.getInt(0), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    val b0 = out("0-7")
    assert((b0._1, b0._2, b0._3, b0._4) == ((0, 2L, 1L, 0.5)))
    assert(b0._5 > 0.0 && b0._5 < 0.5, "Wilson lb strictly inside (0, p)")
    val b1 = out("8-30")
    assert((b1._1, b1._2, b1._3, b1._4) == ((1, 1L, 0L, 0.0)))
    assert(math.abs(b1._5) < 1e-12, "p=0 collapses the bound to 0")
  }

  test("discountReturns: integer point bands, boundary at 5 stays light") {
    val li = Seq(
      (0.00, "R"), (0.00, "N"),         // none: 1/2 returned
      (0.05, "N"), (0.03, "N"),         // light: 0/2
      (0.06, "R"), (0.10, "R"))         // deep: 2/2
      .toDF("l_discount", "l_returnflag")
    val out = Analytics.discountReturns(li).collect()
      .map(r => r.getString(1) -> ((r.getInt(0), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(out("none") == ((0, 2L, 1L, 0.5)))
    assert(out("light_1_5") == ((1, 2L, 0L, 0.0)))
    assert(out("deep_6_plus") == ((2, 2L, 2L, 1.0)))
  }

  test("newVsReturning: first-quarter orders are new, rest returning") {
    def d(s: String) = Date.valueOf(s)
    val orders = Seq(
      (1L, d("2024-01-15"), 10.0),   // c1 Q1: new
      (1L, d("2024-05-01"), 20.0),   // c1 Q2: returning
      (2L, d("2024-06-01"), 5.0))    // c2 Q2: new
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Analytics.newVsReturning(orders).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out == Map(
      "2024-01-01" -> ((1L, 0L, 1000L, 0L, 1.0)),
      "2024-04-01" -> ((1L, 1L, 500L, 2000L, 500.0 / 2500.0))))
  }

  test("priceIndex: base quarter pins 100; late-born parts excluded") {
    def d(s: String) = Date.valueOf(s)
    val li = Seq(
      (1L, d("2024-01-10"), 10.0, 2.0),  // p1 Q1: unit 500c, q0=2
      (1L, d("2024-04-10"), 6.0, 1.0),   // p1 Q2: unit 600c
      (2L, d("2024-02-01"), 1.0, 1.0),   // p2 Q1 only
      (3L, d("2024-05-01"), 9.0, 1.0))   // p3 born Q2: no base match
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity")
    val part = Seq((1L, "A"), (2L, "A"), (3L, "A"))
      .toDF("p_partkey", "p_brand")
    val out = Analytics.priceIndex(li, part).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // Q1 = base: both parts match themselves -> exactly 100
    assert(out(("A", "2024-01-01")) == ((2L, 100.0)))
    // Q2: only p1 matched: 600*2 / (500*2) * 100 = 120
    assert(out(("A", "2024-04-01")) == ((1L, 120.0)))
    assert(out.size == 2, "the late-born part contributes no cell")
  }

  test("backlog: difference-array curve over the dense day spine") {
    def d(s: String) = Date.valueOf(s)
    val orders = Seq(
      (1L, d("2024-01-01")), (2L, d("2024-01-02")),
      (3L, d("2024-01-03")))                     // no lines: excluded
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, d("2024-01-02")), (1L, d("2024-01-04")),  // closes 01-04
      (2L, d("2024-01-02")))                         // closes 01-02
      .toDF("l_orderkey", "l_shipdate")
    val out = Analytics.backlog(orders, li).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(out.toSeq == Seq(
      "2024-01-01" -> ((1L, 0L, 1L)),
      "2024-01-02" -> ((1L, 1L, 1L)),
      "2024-01-03" -> ((0L, 0L, 1L)),
      "2024-01-04" -> ((0L, 1L, 0L))))
  }

  test("discountElasticity: exact-moment slope, NULL on zero variance") {
    // brand B1: (x=0,y=10) x2, (x=10,y=20) x2 -> slope = 1 unit/pt,
    // avg 15. B2: all x=5 -> zero x-variance -> NULL slope.
    val li = Seq((1L, 0.0, 10.0), (1L, 0.0, 10.0),
      (1L, 0.10, 20.0), (1L, 0.10, 20.0),
      (2L, 0.05, 7.0), (2L, 0.05, 9.0))
      .toDF("l_partkey", "l_discount", "l_quantity")
    val part = Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
    val out = Analytics.discountElasticity(li, part).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out("B1") == ((4L, 15.0, Some(1.0))))
    assert(out("B2") == ((2L, 8.0, None)))
  }

  test("soleLateSuppliers: only the sole late supplier of a shared order") {
    val orders = Seq((1L, Date.valueOf("2024-01-01")),
      (2L, Date.valueOf("2024-01-01")), (3L, Date.valueOf("2024-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    // order 1: s10 late, s20 on time -> s10 counts
    // order 2: s10 and s20 BOTH late -> nobody counts (not sole)
    // order 3: s30 late but alone on the order -> no other supplier,
    //          the EXISTS leg drops it
    val li = Seq(
      (1L, 10L, "2024-06-01"), (1L, 20L, "2024-01-05"),
      (2L, 10L, "2024-06-01"), (2L, 20L, "2024-06-02"),
      (3L, 30L, "2024-06-01"))
      .map { case (o, s, d) => (o, s, Date.valueOf(d)) }
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((10L, "s#10"), (20L, "s#20"), (30L, "s#30"))
      .toDF("s_suppkey", "s_name")
    val out = Analytics.soleLateSuppliers(li, orders, supp, 100).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("s#10", 1L)))
  }

  test("kAnonymity flags classes under k with generalized values") {
    val df = Seq((1, "A", 500.0), (1, "A", 700.0), (1, "A", 1500.0))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Privacy.kAnonymity(df, Seq(
      "nationkey" -> col("c_nationkey"),
      "band" -> floor(col("c_acctbal") / 1000).cast("bigint")), k = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out((1, 0L)) == ((2L, true)))   // two in band 0 → anonymous
    assert(out((1, 1L)) == ((1L, false)))  // singleton class exposed
  }

  test("forecastNaive: exact day-lag join, NULL before history exists") {
    def ev(day: Int, n: Int) = (1 to n).map(i =>
      (day * 100L + i, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"),
        1L, "view", 0.0))
    val events = (ev(1, 3) ++ ev(8, 5) ++ ev(15, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Temporal.forecastNaive(events, 7).collect()
      .map(r => r.getDate(1).toString ->
        (r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out("2024-01-01") == ((3L, None, None)))       // no baseline
    assert(out("2024-01-08") == ((5L, Some(3L), Some(2L))))
    assert(out("2024-01-15") == ((2L, Some(5L), Some(3L))))
  }

  test("smallOrderRevenue: per-part avg threshold, brand rollup") {
    import spark.implicits._
    // part 1: quantities (1, 10, 49) -> avg 20, small = qty < 4:
    // only the 1. part 2: (5, 5) -> avg 5, nothing below 1 -> absent.
    val li = Seq(
      (1L, 1.0, 100.50), (1L, 10.0, 200.0), (1L, 49.0, 300.0),
      (2L, 5.0, 50.0), (2L, 5.0, 60.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "Brand#1"), (2L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
    val out = Analytics.smallOrderRevenue(li, part, 0.2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("Brand#1", 1L, 100.50)))
  }

  test("bulkOrders: having-filtered aggregate joins only qualifiers") {
    import spark.implicits._
    val li = Seq((1L, 150.0), (1L, 100.0), (2L, 50.0))
      .toDF("l_orderkey", "l_quantity")
    val orders = Seq((1L, 10L, 999.0, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, 11L, 5.0, Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val cust = Seq((10L, "Alice"), (11L, "Bob")).toDF("c_custkey", "c_name")
    val out = Analytics.bulkOrders(li, orders, cust, minQty = 200).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(5)))
    assert(out.toSeq == Seq(("Alice", 1L, 250.0)))
  }

  test("idleRichCustomers: integer above-average test + recency anti-join") {
    import spark.implicits._
    // balances 10, 20, 30 -> avg 20: only 30 is above. Customer 3 has
    // a recent order -> excluded; customer 4 (bal 30, old order) stays
    val cust = Seq((3L, 1, 30.0), (4L, 1, 30.0), (5L, 2, 10.0),
      (6L, 2, 10.0)).toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq(
      (3L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (4L, Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("o_custkey", "o_orderdate")
    val out = Analytics.idleRichCustomers(cust, orders, idleDays = 365)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1, 1L, 30.0)))
  }

  test("supplierRisk: exposure share is the risky suppliers' revenue") {
    val li = Seq(
      (1L, 10.0, 0.0), (1L, 20.0, 0.0),   // supplier 1: 30 revenue
      (2L, 70.0, 0.0))                     // supplier 2: 70 revenue
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val sup = Seq((1L, 5, -10.0), (2L, 5, 10.0))
      .toDF("s_suppkey", "s_nationkey", "s_acctbal")
    val out = Analytics.supplierRisk(li, sup).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 100.0 && r.getDouble(4) == 30.0)
    assert(r.getDouble(5) == 0.3)
  }

  test("priceRealization: selling at list yields ratio exactly 1") {
    // one part listed at 10.00, sold once: qty 2 at extprice 20, no
    // discount -> realized unit 10.00 == mean list -> ratio 1.0
    val part = Seq((1L, "B#1", 10.0))
      .toDF("p_partkey", "p_brand", "p_retailprice")
    val li = Seq((1L, 2.0, 20.0, 0.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val out = Analytics.priceRealization(li, part).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) == 10.0 && out.head.getDouble(3) == 10.0)
    assert(out.head.getDouble(4) == 1.0)
  }

  test("giniByNation: 0 for equal revenues, 2/9 for the 1-2-3 ramp") {
    import java.sql.Timestamp
    // nation 1: three equal customers -> G = 0 exactly;
    // nation 2: revenues 1,2,3 -> G = 2*(1+4+9)/(3*6) - 4/3 = 2/9
    val cust = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 2), (5L, 2), (6L, 2))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (1L, 10.0), (2L, 10.0), (3L, 10.0),
      (4L, 1.0), (5L, 2.0), (6L, 3.0))
      .toDF("o_custkey", "o_totalprice")
    val out = Analytics.giniByNation(orders, cust).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3)))
    assert(out.length == 2)
    assert(out(0) == ((1, 3L, 0.0)))
    assert(math.abs(out(1)._3 - 2.0 / 9.0) < 1e-15)
  }

  test("reconcile: orphan headers, per-line cent rounding, net drift") {
    // order 1: two lines, derived total == header (diff 0)
    // order 2: header overstates by 5.00 -> diff -500, mismatch
    // order 3: NO lines -> orphan header, excluded from diff stats
    val orders = Seq(
      (1L, "O", 220.00), (2L, "F", 115.00), (3L, "O", 50.00))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val lines = Seq(
      (1L, 100.0, 0.0, 0.1),   // 110.00
      (1L, 100.0, 0.0, 0.1),   // 110.00 -> order 1 total 220.00
      (2L, 100.0, 0.0, 0.1))   // 110.00 vs header 115.00
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val out = Analytics.reconcile(orders, lines).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))).toMap
    assert(out("O") == ((2L, 1L, 0L, 0L, 0L)),
      "order 1 reconciles exactly; order 3 counts as orphan only")
    assert(out("F") == ((1L, 0L, 1L, 500L, -500L)),
      "order 2 mismatches by exactly 500 cents, net drift signed")
  }

  test("abcAnalysis: 80/95 cuts close WITH the boundary part") {
    // revenues 80/15/5: part 1 closes exactly 80% -> A, part 2 closes
    // exactly 95% -> B, part 3 is the tail -> C
    val li = Seq((1L, 80.0), (2L, 15.0), (3L, 5.0))
      .toDF("l_partkey", "l_extendedprice")
      .withColumn("l_discount", lit(0.0))
    val out = Analytics.abcAnalysis(li).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("A") == ((1L, 80.0, 0.80, 1.0 / 3)))
    assert(out("B") == ((1L, 15.0, 0.15, 1.0 / 3)))
    assert(out("C") == ((1L, 5.0, 0.05, 1.0 / 3)))
  }

  test("orderLineDist: width grid with order and line shares") {
    val li = Seq((1L, 10L), (1L, 20L), (2L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val out = Analytics.orderLineDist(li).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((1L, 0.5, 1.0 / 3)))
    assert(out(2L) == ((1L, 0.5, 2.0 / 3)))
  }

  test("fisherIndex: quantity shift opens the L-P gap, Fisher splits it") {
    import java.sql.Date
    // Q2: part 1 doubles in price and loses volume, part 2 holds price
    // and gains it -> Laspeyres 150, Paasche 110, Fisher sqrt(1.65)*100
    val li = Seq(
      (1L, "2024-01-15", 10.00, 10.0), (2L, "2024-01-15", 10.00, 10.0),
      (1L, "2024-04-15", 4.00, 2.0), (2L, "2024-04-15", 18.00, 18.0))
      .map { case (p, d, e, q) => (p, Date.valueOf(d), e, q) }
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity")
    val part = Seq((1L, "X"), (2L, "X")).toDF("p_partkey", "p_brand")
    val out = Analytics.fisherIndex(li, part).collect()
      .map(r => r.getDate(1).toString ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out("2024-01-01") == ((2L, 100.0, 100.0, 100.0)))
    assert(out("2024-04-01")._2 == 150.0 &&
      math.abs(out("2024-04-01")._3 - 110.0) < 1e-12) // 1.1 not dyadic
    assert(math.abs(out("2024-04-01")._4 - math.sqrt(1.5 * 1.1) * 100.0)
      < 1e-12)
  }

  test("partVintage: relative-quarter ramp per intro cohort") {
    import java.sql.Date
    val li = Seq(
      (1L, "2024-01-10", 10.0), (1L, "2024-04-10", 20.0),
      (2L, "2024-05-01", 5.0))
      .map { case (p, d, e) => (p, Date.valueOf(d), e, 0.0) }
      .toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    val out = Analytics.partVintage(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(out((2024L, 1L)) == ((1L, 10.0, 20.0, 0.0, 0.0)))
    assert(out((2024L, 2L)) == ((1L, 5.0, 0.0, 0.0, 0.0)))
  }

  test("acctbalBands: cent-grid quartiles, negative share") {
    val c = Seq(("A", 1.00), ("A", 2.00), ("A", 3.00), ("A", -1.00))
      .toDF("c_mktsegment", "c_acctbal")
    val r = Analytics.acctbalBands(c).collect().head
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6)) ==
      (("A", 4L, 1.25, 0.25, 0.5, 1.5, 2.25)))
  }

  test("minCostSupplier: region cut, integer-cent min, ties both kept") {
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // part 1: s10 quotes 200c then 150c, s11 quotes 150c (300c/qty 2)
    // -> tie at the 150c min, both rows survive; s12 quotes 100c but
    // sits outside the region. part 2: only s10. parts 3/4 fail the
    // type/size slice.
    val li = Seq(
      (1L, 10L, 1.0, 2.00), (1L, 10L, 1.0, 1.50), (1L, 11L, 2.0, 3.00),
      (1L, 12L, 1.0, 1.00), (2L, 10L, 1.0, 5.00), (3L, 10L, 1.0, 1.00),
      (4L, 10L, 1.0, 1.00))
      .map { case (p, s, q, x) => (p, s, q, x, ts("2024-01-01")) }
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_shipdate")
    val part = Seq((1L, "Brand#1", "STANDARD", 5), (2L, "Brand#2", "STANDARD", 10),
      (3L, "Brand#3", "PROMO", 5), (4L, "Brand#4", "STANDARD", 7))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supp = Seq((10L, "S10", 0, 100.0), (11L, "S11", 0, 200.0),
      (12L, "S12", 1, 999.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nat = Seq((0, "N0", 0), (1, "N1", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name")
    val out = Analytics.minCostSupplier(li, part, supp, nat, reg,
      "EUROPE", "STANDARD", 5, 100).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (200.0, "S11", "N0", 1L, 1.50),
      (100.0, "S10", "N0", 1L, 1.50),
      (100.0, "S10", "N0", 2L, 5.00)))
  }

  test("importantStock: nation filter, cross-multiplied share cut") {
    val li = Seq((1L, 1L, 10.0), (1L, 3L, 99.0), (2L, 2L, 1.0),
      (3L, 1L, 0.5))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val supp = Seq((1L, 3), (2L, 3), (3L, 4))
      .toDF("s_suppkey", "s_nationkey")
    // nation-3 values: part1 1000c, part2 100c, part3 50c; total 1150c
    // keep value*10 > 1150 -> part 1 only
    val out = Analytics.importantStock(li, supp, 3, 10L).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L)
    assert(out.head.getDouble(1) == 10.0)
    assert(out.head.getDouble(2) == 1000.0 / 1150.0)
  }

  test("promoStockSuppliers: window + type cut, strict majority, " +
      "exact-half excluded") {
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, 1L, 6.0, "2024-01-10"), (1L, 2L, 4.0, "2024-01-11"),
      (2L, 2L, 3.0, "2024-01-12"),
      (3L, 1L, 100.0, "2024-01-13"),      // not a promo part
      (1L, 2L, 50.0, "2024-03-01"),       // outside the window
      (4L, 1L, 5.0, "2024-01-14"), (4L, 2L, 5.0, "2024-01-15"))
      .map { case (p, s, q, d) => (p, s, q, ts(d)) }
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val part = Seq((1L, "PROMO"), (2L, "PROMO"), (3L, "STANDARD"),
      (4L, "PROMO")).toDF("p_partkey", "p_type")
    val supp = Seq((1L, "S1", 0), (2L, "S2", 1))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nat = Seq((0, "N0"), (1, "N1")).toDF("n_nationkey", "n_name")
    val out = Analytics.promoStockSuppliers(li, part, supp, nat,
      "PROMO", "2024-01-01", "2024-02-01").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // part 1: s1 ships 6 of 10 (dominates), s2 4 of 10 (no); part 2:
    // s2 ships all 3; part 4 splits 5/5 -> the 2*q > total strict
    // cut excludes BOTH
    assert(out.toSeq == Seq((1L, "S1", "N0", 1L, 6L),
      (2L, "S2", "N1", 1L, 3L)))
  }

  test("priceDispersion: integer unit cents, 10% range cut") {
    // part 1: units 100 and 120 cents -> range 20, 200 > 100 dispersed;
    // part 2: units 100 and 105 -> 50 > 100 fails, consistent
    val li = Seq(
      (1L, 1.00, 1.0), (1L, 2.40, 2.0),
      (2L, 1.00, 1.0), (2L, 2.10, 2.0))
      .toDF("l_partkey", "l_extendedprice", "l_quantity")
    val part = Seq((1L, "X"), (2L, "X")).toDF("p_partkey", "p_brand")
    val r = Analytics.priceDispersion(li, part).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4)) == (("X", 2L, 1L, 0.5, 0.125)))
  }

  test("catalogCoverage: never-sold parts survive the left join") {
    val li = Seq((1L, 10.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val part = Seq((1L, "X"), (2L, "X"), (3L, "Y"))
      .toDF("p_partkey", "p_brand")
    val out = Analytics.catalogCoverage(li, part).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) -1.0 else r.getDouble(5)))).toMap
    assert(out("X") == ((2L, 1L, 0.5, 10.0, 10.0)))
    assert(out("Y") == ((1L, 0L, 0.0, 0.0, -1.0)))
  }
}
