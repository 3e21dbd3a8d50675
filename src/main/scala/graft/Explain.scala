package graft

/** Dev tool: print the formatted physical plan of one query and time
  * its execution. Usage: runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").forall(_ == "1")
    val spark = GraftSession.local()
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) df.explain("formatted")
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[explain] $name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
