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

  test("name parsing is flag-position independent") {
    val all = SparkEntry.queries.keys.toSeq.sorted
    assert(Runner.parseNames(Array("sf", "out")) == all)
    assert(Runner.parseNames(Array("sf", "out", "all")) == all)
    assert(Runner.parseNames(Array("sf", "out", "all", "--force")) == all)
    assert(Runner.parseNames(Array("sf", "out", "q1,q2")) == Seq("q1", "q2"))
    // the bug this guards: flag before the name must NOT mean "all"
    assert(Runner.parseNames(Array("sf", "out", "--force", "q1")) == Seq("q1"))
  }
}
