package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Thin pipeline runner: execute named engine queries against one sf
  * directory and write each result as a parquet output with Luigi-like
  * target semantics — an output that already exists (its `_SUCCESS`
  * marker) is skipped, so a re-run after a partial failure only
  * executes the missing pieces.
  *
  * This is the engine-side analog of the reference's task layer
  * (/root/reference/metrics/tasks/create_hh_metrics_task.py:12-77 —
  * Luigi tasks whose `output()` targets gate `run()`), kept
  * deliberately thin: orchestration (scheduling, retries, DAGs) stays
  * with whatever runs the JVM; the runner only contributes idempotent
  * targets and a machine-readable per-query status line.
  *
  * Usage: runMain graft.Runner <sfDir> <outDir> [query,query,…|all]
  * [--force]
  */
object Runner {

  def runOne(spark: SparkSession, sfDir: String, outDir: String,
             name: String, force: Boolean): String = {
    // Hadoop FS, not java.nio: outDir may be hdfs://, s3a://, file:/ —
    // the target probe must see the same filesystem the write targets
    val target = new Path(outDir, name)
    val success = new Path(target, "_SUCCESS")
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    if (!force && fs.exists(success)) "skipped (target exists)"
    else {
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").parquet(target.toString)
        "written"
      } finally {
        // queries persist intermediate frames scoped to their own run
        // (minhash signatures, QA input projections, zipWithIndex base
        // RDDs); drop them — on failure too, or a crashed query's
        // cached frames squeeze every subsequent query — so a 40-query
        // run doesn't accumulate caches for the session lifetime
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
  }

  /** Every non-flag arg past <outDir> is a name list — flag position
    * doesn't matter ("--force q1" must not silently mean "all"). */
  def parseNames(args: Array[String]): Seq[String] = {
    val nameArgs = args.drop(2).filterNot(_.startsWith("--"))
      .flatMap(_.split(',')).filterNot(_.isEmpty).toSeq
    if (nameArgs.isEmpty || nameArgs == Seq("all"))
      SparkEntry.queries.keys.toSeq.sorted
    else nameArgs
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Runner <sfDir> <outDir> [names|all] [--force]")
    val sfDir = args(0)
    val outDir = args(1)
    val force = args.contains("--force")
    val names = parseNames(args)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local()
    var failed = 0
    names.foreach { name =>
      val status =
        try runOne(spark, sfDir, outDir, name, force)
        catch { case e: Throwable => failed += 1; s"FAILED: $e" }
      println(s"[runner] $name: $status")
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
