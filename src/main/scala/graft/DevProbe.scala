package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators.NearDup

/** Scratch dev main — timing decomposition, not part of the library. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sc = spark.sparkContext
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    def clear(): Unit = {
      spark.catalog.clearCache()
      Caches.clear()
      sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def time2(label: String)(f: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        clear()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label min=${ts.min}%.2f s (runs ${ts.map(t => f"$t%.1f").mkString(", ")})")
    }
    val docs = Tables.documentsFloored(spark, dir)

    def pairsExpr = expr(
      """flatten(transform(sequence(1, size(ids) - 1),
         i -> transform(sequence(i + 1, size(ids)),
         j -> struct(element_at(ids, i) AS d1, element_at(ids, j) AS d2))))""")

    // OLD shape: verify-all complement off distinct candidates
    def old(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("d1")).orderBy(col("jaccard").desc, col("d2"))
      val sig = NearDup.signatures(docs, 3, 32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bnd = NearDup.bandRows(sig, 16, 2)
      val cand = bnd
        .groupBy(col("band"), col("band_sig"))
        .agg(slice(sort_array(collect_list(col("doc_id"))), 1,
          NearDup.DefaultBucketCap).as("ids"))
        .where(size(col("ids")) > 1)
        .select(explode(pairsExpr).as("p"))
        .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .distinct()
      val t = sig.select(col("doc_id"), col("sh"))
      cand
        .join(t.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
        .join(t.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
        .withColumn("jaccard",
          size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
            size(array_union(col("sh1"), col("sh2"))))
        .where(col("jaccard") < 0.5)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 8)
        .select(col("d1"), col("d2"), col("jaccard"), col("rank"))
        .orderBy(col("d1"), col("rank"))
    }
    time2("OLD verify-all")(old())
    time2("NEW preCap=64 (current)")(NearDup.hardNegatives(docs))
    time2("NEW preCap=16")(NearDup.hardNegatives(docs, preCap = 16))
    spark.stop()
  }
}
