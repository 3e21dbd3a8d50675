package graft

import org.apache.spark.sql.functions._
import graft.operators.Affinity

/** Scratch dev main — timing decomposition, not part of the library. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = Tables.lineitem(spark, dir)
    val op = li.select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    time("distinct op")(op.write.format("noop").mode("overwrite").save())
    val cnt = op.groupBy(col("part")).agg(count(lit(1)).as("cnt"))
    val sets = op.join(cnt, "part")
      .groupBy(col("okey"))
      .agg(sort_array(collect_set(struct(col("part"), col("cnt")))).as("ps"))
    time("sets")(sets.write.format("noop").mode("overwrite").save())
    val pairs = Affinity.coPurchasePairs(li)
    time("pairs full")(pairs.write.format("noop").mode("overwrite").save())
    println("[probe] pair rows " + pairs.count())
    time("pairs again (op cached)")(
      pairs.write.format("noop").mode("overwrite").save())
    time("itemSimilarity")(
      Affinity.itemSimilarity(li).write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    time("pageRank 1 iter")(
      Affinity.pageRank(li, 1).write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    time("pageRank 3 iter")(
      Affinity.pageRank(li, 3).write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    // decompose setup
    val pairs2 = Affinity.coPairs(li)  // the production pageRank path
    time("pr: pairs")(pairs2.write.format("noop").mode("overwrite").save())
    val edges2 = pairs2.unionAll(pairs2.select(col("part_b"), col("part_a"))).toDF("src", "dst")
    val deg2 = edges2.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesDeg2 = edges2.join(deg2, "src").repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pr: edgesDeg materialize")(edgesDeg2.write.format("noop").mode("overwrite").save())
    val nodes2 = deg2.select(col("src").as("node"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pr: nodes materialize")(nodes2.write.format("noop").mode("overwrite").save())
    var ranks2 = nodes2.select(col("node"), lit(1000000L).as("rank_micro"))
    for (it <- 1 to 3) {
      time(s"pr: iteration $it") {
        val inflow = edgesDeg2.join(ranks2.hint("SHUFFLE_HASH"), edgesDeg2("src") === ranks2("node"))
          .select(col("dst"), expr("((rank_micro * 17) div 20) div deg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
        ranks2 = nodes2.join(inflow, nodes2("node") === inflow("dst"), "left")
          .select(col("node"), (lit(150000L) + coalesce(col("inflow"), lit(0L))).as("rank_micro"))
          .localCheckpoint()
      }
    }
    spark.stop()
  }
}
