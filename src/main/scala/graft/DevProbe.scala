package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators.VectorSearch

/** Scratch dev main — timing decomposition, not part of the library. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sc = spark.sparkContext
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def clear(): Unit = {
      spark.catalog.clearCache()
      Caches.clear()
      sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def show(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = f.collect()
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      rows.foreach(r => println("[probe]   " + r))
      clear()
    }
    val emb = Tables.embeddings(spark, dir)
    val stride = VectorSearch.centroidStrideFor(emb.count())
    val seeds = emb.where(col("vec_id") % stride === 0)
    val ks = Seq(1, 3, 10)
    show("recall curve STRIDE")(
      VectorSearch.annRecallCurve(emb, seeds, col("vec_id") < 10, ks))
    show("balance STRIDE")(VectorSearch.ivfBalance(emb, seeds))
    def trained(it: Int) =
      VectorSearch.trainCentroids(emb, seeds, it)
        .select(col("centroid_id").as("vec_id"), col("embedding"))
    Seq(1, 2).foreach { it =>
      show(s"recall curve LLOYD$it")(
        VectorSearch.annRecallCurve(emb, trained(it), col("vec_id") < 10, ks))
      show(s"balance LLOYD$it")(VectorSearch.ivfBalance(emb, trained(it)))
    }
    spark.stop()
  }
}
