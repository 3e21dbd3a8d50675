package graft

import org.apache.spark.sql.functions._
import graft.operators.NearDup

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom agg: zero false negatives, bounded false positives") {
    val members = spark.range(0, 2000).toDF("id")
    val blob = members
      .agg(expr("graft_bloom_agg(xxhash64(id), 65536, 5)").as("bf"))
    // every inserted value must be contained (false negatives break
    // the pruning contract)
    val missed = members.crossJoin(broadcast(blob))
      .where(!expr("graft_bloom_contains(bf, xxhash64(id))")).count()
    assert(missed == 0)
    // disjoint probes: 65536 bits / 2000 entries / 5 hashes → FP rate
    // well under 1%; allow 5% slack for hash variance
    val fp = spark.range(1000000, 1010000).toDF("id")
      .crossJoin(broadcast(blob))
      .where(expr("graft_bloom_contains(bf, xxhash64(id))")).count()
    assert(fp < 500, s"false-positive count $fp of 10000")
  }

  test("bloom partial buffers merge across partitions") {
    val one = spark.range(0, 2000).toDF("id").coalesce(1)
      .agg(expr("graft_bloom_agg(xxhash64(id), 65536, 5)")).head().getAs[Array[Byte]](0)
    val many = spark.range(0, 2000).toDF("id").repartition(8)
      .agg(expr("graft_bloom_agg(xxhash64(id), 65536, 5)")).head().getAs[Array[Byte]](0)
    // OR-merge is order-independent: the bitset is identical however
    // the partials were combined
    assert(java.util.Arrays.equals(one, many))
  }

  test("bloomPrunedOrderStats equals the plain join even with heavy FPs") {
    import graft.operators.Analytics
    // 64-bit bloom over 20 keys -> false-positive rate is enormous;
    // the exact join must still produce the plain-join answer
    val customer = (0L until 40L).map(i => (i, (i % 8).toInt))
      .toDF("c_custkey", "c_nationkey")
    val orders = (0L until 400L).map(i => (i, i % 50L, (i % 13).toDouble))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = Analytics.bloomPrunedOrderStats(orders, customer,
      maxNation = 3, numBits = 64, numHashes = 2).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expected = orders.join(customer,
      col("o_custkey") === col("c_custkey"))
      .where(col("c_nationkey") < 3)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("r"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == expected)
    assert(out.nonEmpty)
  }

  test("dedupIncrementBloom equals the plain exact fingerprint probe") {
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "jumped over the dog"),
      (3L, "the quick brown fox")).toDF("doc_id", "text")
    val inc = Seq(
      (10L, "THE quick brown fox!!"),  // normalizes to corpus dup → rep 1
      (11L, "completely novel text"),
      (12L, "jumped over the dog")).toDF("doc_id", "text")
    val out = NearDup.dedupIncrementBloom(inc, corpus, numBits = 4096)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getInt(2))).toMap
    assert(out(10L) == ((Some(1L), 1)))
    assert(out(11L) == ((None, 0)))
    assert(out(12L) == ((Some(2L), 1)))
  }
}
