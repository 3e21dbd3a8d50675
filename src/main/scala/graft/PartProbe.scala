package graft

import org.apache.spark.sql.functions._

/** Scratch probe (round 14): does a persisted repartition(n, k) frame
  * keep its HashPartitioning for downstream join planning in Spark
  * 4.1, and does localCheckpoint? Prints both join plans. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val a0 = spark.range(100000).select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartition(32, col("k"))
    val b0 = spark.range(100000).select(col("id").as("k2"), (col("id") * 3).as("w"))
      .repartition(32, col("k2"))

    println("=== persist path ===")
    val a = a0.persist(); a.count()
    val b = b0.persist(); b.count()
    a.join(b.hint("SHUFFLE_HASH"), col("k") === col("k2")).explain("formatted")

    println("=== localCheckpoint path ===")
    val ac = a0.localCheckpoint()
    val bc = b0.localCheckpoint()
    ac.join(bc.hint("SHUFFLE_HASH"), col("k") === col("k2")).explain("formatted")

    println("=== pagerank iteration shape ===")
    val nodes = spark.range(10000).select(col("id").as("node"))
      .repartition(32, col("node")).persist()
    nodes.count()
    val edges = spark.range(40000)
      .select((col("id") % 10000).as("src"), ((col("id") * 7) % 10000).as("dst"),
        lit(4L).as("deg"))
      .repartition(32, col("src")).persist()
    edges.count()
    val ranks = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    val inflow = edges
      .join(ranks.hint("SHUFFLE_HASH"), edges("src") === ranks("node"))
      .select(col("dst"), expr("((rank_micro * 17) div 20) div deg").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
    nodes.join(inflow.hint("SHUFFLE_HASH"),
        nodes("node") === inflow("dst"), "left")
      .select(col("node"),
        (lit(150000L) + coalesce(col("inflow"), lit(0L))).as("rank_micro"))
      .explain("formatted")
    spark.stop()
  }
}
