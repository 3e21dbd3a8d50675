package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators.VectorSearch

/** Scratch dev main — timing decomposition, not part of the library. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sc = spark.sparkContext
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo
        val ms = for {
          a <- s.submissionTime; b <- s.completionTime
        } yield b - a
        stages.add(f"stage ${s.stageId}%4d tasks=${s.numTasks}%5d " +
          f"wall=${ms.getOrElse(-1L) / 1000.0}%8.1fs " +
          f"cpu=${s.taskMetrics.executorCpuTime / 1e9}%8.1fs " +
          f"run=${s.taskMetrics.executorRunTime / 1e3}%8.1fs " +
          f"gc=${s.taskMetrics.jvmGCTime / 1e3}%7.1fs " +
          f"spill=${s.taskMetrics.diskBytesSpilled / 1e6}%8.1fMB " +
          f"shW=${s.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          s.name.take(60))
      }
    })
    def clear(): Unit = {
      spark.catalog.clearCache()
      Caches.clear()
      sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def time1(label: String)(f: => DataFrame): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      stages.forEach(s => println("[probe]   " + s))
      clear()
    }
    val emb = Tables.embeddings(spark, dir)
    val stride = VectorSearch.centroidStrideFor(emb.count())
    val seeds = emb.where(col("vec_id") % stride === 0)
    time1("assignCells #1")(VectorSearch.assignCells(emb, seeds))
    time1("assignCells #2")(VectorSearch.assignCells(emb, seeds))
    spark.stop()
  }
}
