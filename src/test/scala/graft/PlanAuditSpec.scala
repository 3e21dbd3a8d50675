package graft

/** Physical-plan regression guards: the scale-critical plan shapes the
  * round-2 audit established, asserted so a refactor can't silently
  * reintroduce a scan-everything, single-partition-window or
  * recompute-the-pipeline plan. String-level assertions on the
  * executed plan are deliberate — they survive optimizer rule renames
  * better than node-type matching.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q1 pricing scan pushes the shipdate filter and prunes columns") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    // 6 of 16 lineitem columns read; a pruning regression would pull
    // wide unused columns like l_comment back into the scan
    assert(!p.contains("l_comment") && !p.contains("l_shipinstruct"))
  }

  test("revenue-by-nation builds broadcast joins for the dim side") {
    assert(plan("q_revenue_by_nation").contains("BroadcastHashJoin"))
  }

  test("value mapping has no window operator at all") {
    // the dense ids come from two-phase range-partition + zipWithIndex;
    // a WindowExec here means the single-partition dense_rank is back
    assert(!plan("q_value_mapping").contains("Window"))
  }

  test("IVF assignment is aggregate-based; only the query top-k windows") {
    val p = plan("q_ann_ivf")
    assert(p.contains("max_by"), p.take(2000))
    // exactly one Window chain (rank over query_id) — the assignment
    // no longer windows the corpus x centroids expansion
    assert("(?<!Group)Window(?!GroupLimit)".r.findAllIn(p).size == 1, p.take(2000))
  }

  test("minhash reuses one cached signature frame") {
    val p = plan("q_minhash_dedup")
    // bands + both verify sides read the persisted frame
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3, p.take(2000))
  }
}
