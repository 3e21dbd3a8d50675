package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorSearch

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f), Array(2.0f, 9.0f)),   // length mismatch → min length
    (3L, null.asInstanceOf[Array[Float]], Array(1.0f))
  ).toDF("id", "a", "b")

  test("graft_dot computes the double dot product (codegen path)") {
    val r = df.select(col("id"), VectorSearch.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(r(1L) == Some(32.0))
    assert(r(2L) == Some(2.0))
    assert(r(3L).isEmpty)  // null input → null
  }

  test("graft_dot matches the zip_with/aggregate fold bit-for-bit") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val both = emb.select(
      VectorSearch.dot(col("embedding"), col("embedding")).as("native"),
      aggregate(
        zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof"))
    assert(both.where(col("native") =!= col("hof")).count() == 0)
  }

  test("graft_dot matches a driver-side reference on 200 random vectors") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 200).map { i =>
      (i.toLong, Array.fill(33)(rnd.nextFloat() * 2 - 1), Array.fill(33)(rnd.nextFloat() * 2 - 1))
    }
    val expected = data.map { case (i, a, b) =>
      i -> a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    }.toMap
    val got = data.toDF("id", "a", "b")
      .select(col("id"), VectorSearch.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    data.foreach { case (i, _, _) => assert(got(i) == expected(i), s"row $i") }
  }

  test("graft_dot rejects wrong input types at analysis") {
    val bad = Seq((1, "x")).toDF("id", "s")
    val e = intercept[Exception] {
      bad.select(VectorSearch.dot(col("s"), col("s"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dot") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("quantizeReport: codes exact, errors bounded by half a level") {
    // dim=4 fixture with a known per-dim range and one degenerate dim
    val df = Seq(
      (1L, Array(0.0f, 10.0f, 5.0f, 2.0f)),
      (2L, Array(1.0f, 20.0f, 5.0f, 2.0f)),
      (3L, Array(0.5f, 15.0f, 5.0f, 2.0f)),
      (4L, null.asInstanceOf[Array[Float]]),            // dropped
      (5L, Array(0.0f, 0.0f)))                          // wrong dim
      .toDF("vec_id", "embedding")
    val out = VectorSearch.quantizeReport(df, expectedDim = 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // v1: dims at range ends -> codes 0/0, degenerate dims -> 0;
    // reconstruction at the ends is exact
    assert(out(1L).getLong(1) == 0L && out(1L).getDouble(2) == 0.0)
    assert(out(2L).getLong(1) == 510L && out(2L).getDouble(2) == 0.0)
    // v3 sits mid-range: error bounded by half a quantization step
    val maxStep = math.max(1.0 / 255, 10.0 / 255)
    assert(out(3L).getDouble(2) <= maxStep / 2 + 1e-12)
    assert(out(3L).getDouble(3) >= 0.0)
  }

  test("sqTopK ranks like exact search when margins exceed quant error") {
    // well-separated directions in 4-d: quantization error (≤ half a
    // level of the per-dim range) cannot reorder these cosines
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // query
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // closest
      (2L, Array(0.5f, 0.5f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.1f, 0.0f)))  // farthest
      .toDF("vec_id", "embedding")
    val sq = VectorSearch.sqTopK(df, expectedDim = 4, nQueries = 1, k = 4)
      .collect().map(r => (r.getInt(2), r.getLong(1)))
    assert(sq.toSeq == Seq((1, 1L), (2, 2L), (3, 3L), (4, 4L)))
    val exact = VectorSearch.bruteForceTopK(df,
      df.where(col("vec_id") === 0L), 4)
      .collect().map(r => (r.getInt(2), r.getLong(1)))
    assert(sq.toSeq == exact.toSeq,
      "SQ ranking must match exact on separated vectors")
  }

  test("graft_minhash equals the k-pass HOF formulation, null on empty") {
    import graft.operators.NearDup
    val k = 8
    val coef = NearDup.minhashCoefficients(k)
    val aLit = array(coef.map(c => lit(c._1)): _*)
    val bLit = array(coef.map(c => lit(c._2)): _*)
    val df = Seq(
      (1L, Seq(17L, -3L, 999999999999L, 0L)),
      (2L, Seq(Long.MaxValue / 3, 42L)),
      (3L, Seq.empty[Long]))
      .toDF("id", "h0s")
    val out = df
      .withColumn("mh", call_function("graft_minhash", col("h0s"), aLit, bLit))
      .select(
        Seq(col("id"), col("mh")) ++ (0 until k).map { i =>
          array_min(transform(col("h0s"),
            h => pmod(h * coef(i)._1 + coef(i)._2, lit(NearDup.HashMod))))
            .as(s"ref$i")
        }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = out(id)
      val mh = r.getSeq[Long](1)
      (0 until k).foreach { i =>
        assert(mh(i) == r.getLong(2 + i), s"id=$id coef $i")
        assert(mh(i) >= 0 && mh(i) < NearDup.HashMod)
      }
    }
    assert(out(3L).isNullAt(1), "empty hash array yields NULL signatures")
  }

  test("graft_simhash of one token mirrors its rolling-hash bits") {
    // with a single token every bit counter is +-1, so the fingerprint
    // IS the token's rolling hash; order of a multi-token bag must not
    // matter; empty bags yield 0
    val df = Seq(
      (1L, Seq("alpha")),
      (2L, Seq("alpha", "beta", "gamma")),
      (3L, Seq("gamma", "alpha", "beta")),
      (4L, Seq.empty[String]))
      .toDF("id", "toks")
    val out = df.select(col("id"),
      call_function("graft_simhash", col("toks")).as("fp"),
      call_function("graft_rolling_hash", lit("alpha")).as("rh"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 == out(1L)._2, "single-token fp = rolling hash")
    assert(out(2L)._1 == out(3L)._1, "order-independent")
    assert(out(4L)._1 == 0L)
    assert((out(1L)._1 >> 40) == 0L, "40-bit fingerprint")
  }

  test("filteredTopK: full k from the query's own stratum, pre-filtered") {
    import spark.implicits._
    // label 1: query 1 plus three same-label candidates; label 2 holds
    // the GLOBALLY nearest vector (identical direction), which
    // pre-filtering must exclude
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 1),
      (2L, Array(0.9f, 0.1f), 1),
      (3L, Array(0.5f, 0.5f), 1),
      (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(1.0f, 0.0f), 2)   // exact match, wrong stratum
    ).toDF("vec_id", "embedding", "label")
    val out = VectorSearch.filteredTopK(df, df.where(col("vec_id") === 1), 3)
      .collect().map(r => r.getInt(3) -> r.getLong(2)).toMap
    assert(out.values.toSet == Set(2L, 3L, 4L), "stratum-only neighbors")
    assert(out(1) == 2L && out(2) == 3L && out(3) == 4L,
      "ranked by exact cosine within the stratum; cross-label exact" +
        " match never appears")
  }

  test("embedOutliers ranks the planted far vector first, drops unhealthy") {
    import spark.implicits._
    // label 7: three vectors near (1,0), one planted at (9,9); the
    // NaN and wrong-dim rows must be excluded from centroid AND ranks
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 7),
      (2L, Array(1.1f, 0.1f), 7),
      (3L, Array(0.9f, -0.1f), 7),
      (4L, Array(9.0f, 9.0f), 7),                       // the outlier
      (5L, Array(Float.NaN, 0.0f), 7),                  // unhealthy
      (6L, Array(1.0f), 7),                             // wrong dim
      (7L, Array(5.0f, 5.0f), 8)                        // other label
    ).toDF("vec_id", "embedding", "label")
    val out = VectorSearch.embedOutliers(df, expectedDim = 2, k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(2)) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out((7, 1))._1 == 4L, "planted far vector ranks first")
    assert(out((7, 1))._2 == 4L, "healthy population only (n=4)")
    assert(out((7, 1))._3 > out((7, 2))._3, "distances strictly ordered")
    // one-vector label: its distance to its own centroid is exactly 0
    assert(out((8, 1)) == ((7L, 1L, 0.0)))
  }

  test("silhouette: separated/misplaced verdicts, exact extremes, " +
      "unhealthy dropped") {
    import spark.implicits._
    // label 0: two near (0,·) plus one planted AT label 1's turf
    // (9,1); label 1: two at (10,·). Centroids: L0 (3,1), L1 (10,1).
    // The planted vector reads a=6, b=1 -> misplaced, sil = -5/6.
    val df = Seq(
      (1L, Array(0.0f, 0.0f), 0),
      (2L, Array(0.0f, 2.0f), 0),
      (3L, Array(9.0f, 1.0f), 0),                 // the defector
      (4L, Array(10.0f, 0.0f), 1),
      (5L, Array(10.0f, 2.0f), 1),
      (6L, Array(Float.NaN, 0.0f), 0),            // unhealthy
      (7L, Array(1.0f), 1)                        // wrong dim
    ).toDF("vec_id", "embedding", "label")
    val out = VectorSearch.silhouette(df, expectedDim = 2).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(7))))
      .toMap
    // label 0: 3 healthy, 2 separated, the defector misplaced
    assert(out(0)._1 == 3L && out(0)._2 == 2L && out(0)._3 == 1L &&
      out(0)._4 == 0L)
    assert(out(0)._5 == 2.0 / 3.0)
    // micro-integer coords make the defector's chain exact:
    // a = 6e6 micro, b = 1e6 micro, sil = (1-6)/6
    assert(out(0)._6 == (1000000.0 - 6000000.0) / 6000000.0)
    // label 1: both vectors sit with their own centroid
    assert(out(1) == ((2L, 2L, 0L, 0L, 1.0,
      out(1)._6)) && out(1)._6 > 0.0)
  }

  test("dimStats: micro-quantized moments, dead dim reads zero") {
    import spark.implicits._
    val df2 = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.5f, 0.0f)),
      (3L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val out = VectorSearch.dimensionStats(df2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(out(1L) == ((2L, 0.75, 0.25, 0.5, 1.0, 0.0)))
    assert(out(2L) == ((2L, 0.0, 0.0, 0.0, 0.0, 1.0)), "dead dimension")
  }

  test("ivfBalance: occupancy buckets plus the max/mean imbalance") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.8f, 0.2f)), (4L, Array(0.1f, 1.0f)))
      .toDF("vec_id", "embedding")
    val ctr = Seq((100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = VectorSearch.ivfBalance(emb, ctr).collect()
    assert(r.length == 1)
    // cells of size 3 and 1 -> one 1-digit bucket; imbalance 3/(4/2)
    assert((r.head.getLong(0), r.head.getLong(1), r.head.getLong(2),
      r.head.getLong(3), r.head.getLong(4), r.head.getDouble(5)) ==
      ((1L, 2L, 4L, 1L, 3L, 1.5)))
  }

  test("knnAccuracy: separable clusters score 1, ties take smaller label") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 1), (2L, Array(0.95f, 0.05f), 1),
      (3L, Array(0.9f, 0.1f), 1),
      (4L, Array(0.0f, 1.0f), 2), (5L, Array(0.05f, 0.95f), 2),
      (6L, Array(0.1f, 0.9f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = VectorSearch.knnAccuracy(emb, col("vec_id") < 100, 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1) == ((3L, 3L, 1.0)) && out(2) == ((3L, 3L, 1.0)))
    // vote tie (one neighbor each of labels 1 and 3) -> smaller label
    // wins, so the label-2 query misses
    val tie = Seq(
      (1L, Array(1.0f, 0.0f), 2), (2L, Array(0.99f, 0.01f), 1),
      (3L, Array(0.98f, 0.02f), 3)).toDF("vec_id", "embedding", "label")
    val t = VectorSearch.knnAccuracy(tie, col("vec_id") === 1, 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(t(2) == ((1L, 0L)), "tie resolved to label 1, not 2 or 3")
  }

  test("annRecallCurve: boundary loss shows at k=2, not k=1") {
    import spark.implicits._
    // v3's true cell is c2, so nprobe=1 from c1 misses it: exact top-2
    // for the query is [2, 3], the probed cell only holds [2]
    val emb = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.2f)),
      (3L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val ctr = Seq((100L, Array(1.0f, 0.0f)), (200L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = VectorSearch.annRecallCurve(emb, ctr,
      col("vec_id") === 1, Seq(1, 2)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((1L, 1L, 1L, 1.0, 1.0)))
    assert(out(2L) == ((2L, 1L, 1L, 0.5, 1.0)))
  }
}
