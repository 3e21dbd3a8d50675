package graft

import java.nio.file.{Files, Paths}

class RunnerSpec extends SparkSpec {

  test("runner writes targets once and skips existing ones") {
    val out = Files.createTempDirectory("graft-runner").toString
    val sfDir = "/root/testdata/sf0.001"
    assert(Runner.runOne(spark, sfDir, out, "q_reach_overall", force = false)
      == "written")
    assert(Files.exists(Paths.get(out, "q_reach_overall", "_SUCCESS")))
    assert(spark.read.parquet(s"$out/q_reach_overall").count() == 1)
    // second run: Luigi-style target semantics
    assert(Runner.runOne(spark, sfDir, out, "q_reach_overall", force = false)
      == "skipped (target exists)")
    // force re-executes
    assert(Runner.runOne(spark, sfDir, out, "q_reach_overall", force = true)
      == "written")
  }

  test("dependencies run first, satisfied targets skip, cycles fail") {
    val deps = Map("b" -> Seq("a"), "c" -> Seq("b", "a"))
    assert(Runner.resolveOrder(Seq("c"), deps) == Seq("a", "b", "c"))
    assert(Runner.resolveOrder(Seq("c", "a"), deps) == Seq("a", "b", "c"))
    intercept[IllegalArgumentException] {
      Runner.resolveOrder(Seq("x"), Map("x" -> Seq("y"), "y" -> Seq("x")))
    }
    // end-to-end: requesting only the dependent runs its dependency
    // first; a re-run skips both via their satisfied targets
    val out = Files.createTempDirectory("graft-runner-deps").toString
    val sfDir = "/root/testdata/sf0.001"
    val first = Runner.runAll(spark, sfDir, out, Seq("q_qa_flags"),
      force = false, deps = Map("q_qa_flags" -> Seq("q_qa_daily")))
    assert(first == Seq("q_qa_daily" -> "written", "q_qa_flags" -> "written"))
    val second = Runner.runAll(spark, sfDir, out, Seq("q_qa_flags"),
      force = false, deps = Map("q_qa_flags" -> Seq("q_qa_daily")))
    assert(second.forall(_._2 == "skipped (target exists)"))
  }

  test("runOne unpersists only the RDDs the query itself created") {
    val out = Files.createTempDirectory("graft-runner-cache").toString
    val hostFrame = spark.range(0, 10).persist()
    hostFrame.count() // materialize the host application's cache
    val hostIds = spark.sparkContext.getPersistentRDDs.keySet
    assert(hostIds.nonEmpty)
    // q_minhash_dedup persists its signature frame internally
    Runner.runOne(spark, "/root/testdata/sf0.001", out, "q_minhash_dedup",
      force = false)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    // the query's own cached frames are gone, the host's survive
    assert(after == hostIds)
    hostFrame.unpersist()
  }

  test("runOne removes its CacheManager entries, not just the RDDs") {
    val out = Files.createTempDirectory("graft-runner-cm").toString
    val hostFrame = spark.range(0, 7).toDF("h").persist()
    hostFrame.count()
    val beforePlans = Runner.cachedPlans(spark)
    assert(beforePlans.nonEmpty, "reflective CacheManager enumeration broke")
    Runner.runOne(spark, "/root/testdata/sf0.001", out, "q_minhash_dedup",
      force = true)
    // a stale entry with unpersisted buffers would be a DEAD cache: the
    // next query persisting the same signature-frame plan would no-op
    // ("already cached") and recompute the chain once per consumer
    val afterPlans = Runner.cachedPlans(spark)
    assert(afterPlans.size == beforePlans.size,
      s"leaked ${afterPlans.size - beforePlans.size} CacheManager entries")
    assert(hostFrame.storageLevel.useMemory, "host cache was clobbered")
    hostFrame.unpersist()
  }

  test("shared seed artifact is run-scoped: survives runOne, released by runAll") {
    val out = Files.createTempDirectory("graft-runner-shared").toString
    val sfDir = "/root/testdata/sf0.001"
    Caches.clear()
    operators.Affinity.clearCache()
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
    assert(Runner.runOne(spark, sfDir, out, "q_span_dedup", force = true)
      == "written")
    // the memoized seed frame survived the per-query cleanup with its
    // buffers intact — q_span_strip/q_novelty in the same run reuse
    // one tokenize+hash corpus scan instead of paying their own
    val kept = Caches.tracked.filter(df =>
      df.storageLevel.useMemory || df.storageLevel.useDisk)
    assert(kept.nonEmpty, "seed frame was dropped by query-scoped cleanup")
    val statuses = Runner.runAll(spark, sfDir, out,
      Seq("q_novelty", "q_span_strip"), force = true, deps = Map.empty)
    assert(statuses.forall(_._2 == "written"), statuses.toString)
    // end of run: the shared artifacts are gone, RDD-level too
    assert(spark.sparkContext.getPersistentRDDs.keySet == beforeIds)
  }

  test("name parsing is flag-position independent") {
    val all = SparkEntry.queries.keys.toSeq.sorted
    assert(Runner.parseNames(Array("sf", "out")) == all)
    assert(Runner.parseNames(Array("sf", "out", "all")) == all)
    assert(Runner.parseNames(Array("sf", "out", "all", "--force")) == all)
    assert(Runner.parseNames(Array("sf", "out", "q1,q2")) == Seq("q1", "q2"))
    // the bug this guards: flag before the name must NOT mean "all"
    assert(Runner.parseNames(Array("sf", "out", "--force", "q1")) == Seq("q1"))
  }

  test("qa_log.txt accumulates status lines across runs, reference format") {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory("graft-qalog").toString
    QaLog.append(spark, out, Seq("INFO" -> "q_x: written"))
    QaLog.append(spark, out, Seq(
      "ERROR" -> "q_y: FAILED: boom",
      "INFO" -> "q_z: skipped (target exists)"))
    val lines = new String(
      Files.readAllBytes(Paths.get(out, QaLog.LogName)), "UTF-8")
      .split("\n").toSeq
    assert(lines.length == 3, s"two appends must accumulate, got $lines")
    // dailyLogger.py formatter shape: timestamp - name - LEVEL - message
    assert(lines.head.matches(
      """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} - graft\.runner - INFO - q_x: written"""),
      lines.head)
    assert(lines(1).contains(" - ERROR - q_y: FAILED: boom"))
    assert(lines(2).contains(" - INFO - q_z: skipped (target exists)"))
  }
}
