package graft

import graft.operators.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def cust(rows: (Long, Int, Double, String)*) =
    rows.map { case (k, nk, bal, seg) =>
      (k, f"Customer#$k%09d", nk, bal, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")

  test("entityMatch links planted dups and same-block near-collisions") {
    val df = cust(
      (3L, 1, 100.0, "AUTO"),   // planted → dup under key offset
      (13L, 2, 100.0, "BIKE"),  // planted, other nation
      (1L, 1, 500.0, "AUTO"),   // unplanted, different block (last3)
      (1104L, 1, 50.0, "AUTO"), // accidental pair: same block, lev 1,
      (2104L, 1, 60.0, "AUTO")) //   close balance — genuine output
    val out = Linkage.entityMatch(Linkage.plantDupes(df)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (3L, 3L + Linkage.DupKeyOffset, 1, 0.25),
      (13L, 13L + Linkage.DupKeyOffset, 1, 0.25),
      (1104L, 2104L, 1, 10.0)))
  }

  test("blocking widths are corpus-derived and pinned across regimes") {
    // Linkage: nation × 10^w blocks, target 64/block, clamp [3, 8].
    assert(Linkage.blockCharsFor(1650L) == 3)      // sf0.01 — unchanged
    assert(Linkage.blockCharsFor(1000000L) == 3)
    assert(Linkage.blockCharsFor(100000000L) == 5)
    assert(Linkage.blockCharsFor(10000000000L) == 7)
    // Entity: 10^len blocks (no nation), target 64/block, clamp [4, 8].
    assert(operators.Entity.blockLenFor(1500L) == 4)  // sf0.01 — unchanged
    assert(operators.Entity.blockLenFor(1000000L) == 5)
    assert(operators.Entity.blockLenFor(100000000L) == 7)
    assert(operators.Entity.blockLenFor(10000000000L) == 8)
  }

  test("entityMatch widened by corpusCount still links planted dups") {
    // At width 4 (forced via a corpusCount in the 1e7 regime:
    // ceil(log10(1e7/1600)) = 4) the planted dup still shares its
    // block — the deletion removes a LEADING zero, so the trailing
    // digits are typo-invariant — while the 1104/2104 accidental
    // pair (same last-3, different last-4) now correctly splits:
    // widening trades exactly that collision class for bounded
    // block size.
    val df = cust(
      (3L, 1, 100.0, "AUTO"),
      (1104L, 1, 50.0, "AUTO"),
      (2104L, 1, 60.0, "AUTO"))
    assert(Linkage.blockCharsFor(10000000L) == 4)
    val out = Linkage.entityMatch(Linkage.plantDupes(df),
      corpusCount = Some(10000000L)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((3L, 3L + Linkage.DupKeyOffset)))
  }

  test("entityMatch gates on segment and balance tolerance") {
    // same block, lev-1 names, but segment differs / balance too far
    val df = cust(
      (1204L, 1, 50.0, "AUTO"),
      (2204L, 1, 55.0, "BIKE"),   // segment mismatch vs 1204
      (1304L, 1, 50.0, "AUTO"),
      (2304L, 1, 500.0, "AUTO"))  // 450 > balTol vs 1304
    assert(Linkage.entityMatch(df).collect().isEmpty)
  }

  test("linkByKeys merges transitively across key kinds, NULLs never link") {
    import org.apache.spark.sql.functions.col
    // A: 1~2 share email x, B: 2~3 share phone y -> {1,2,3}; 4~5 share
    // email z -> {4,5}; 6 isolated (NULL phone must not link 6 and 7)
    val recs = Seq(
      (1L, "x", null.asInstanceOf[String]), (2L, "x", "y"),
      (3L, "w", "y"), (4L, "z", null.asInstanceOf[String]),
      (5L, "z", "p"), (6L, null.asInstanceOf[String], null.asInstanceOf[String]),
      (7L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "email", "phone")
    val out = operators.Entity.linkByKeys(recs, "id", Seq(
      "em" -> col("email"), "ph" -> col("phone"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 2L), (5L, 4L, 2L), (6L, 6L, 1L), (7L, 7L, 1L)))
  }
}
