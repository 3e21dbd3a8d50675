package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, VectorSearch}

/** Persisted-index serving: publishing IVF centroids / PQ codebook /
  * SQ stats and reading them back must reproduce the train-fresh
  * top-k BIT-FOR-BIT — the artifacts are exact frames (float arrays,
  * exact min/max doubles), so a round trip through parquet changes
  * nothing. */
class AnnIndexSpec extends SparkSpec {

  private val Dim = 64

  test("served IVF/PQ/SQ top-k equal train-fresh top-k bit-for-bit") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.where(col("vec_id") % 50 === 0)
    val codebook = centroids
    AnnIndex.publish(emb, centroids, codebook, Dim, prefix = "spec_ann")

    val freshIvf = VectorSearch.ivfTopK(emb, centroids,
      col("vec_id") < 10, 3).collect().toSeq
    val servedIvf = AnnIndex.servedIvfTopK(spark, emb,
      col("vec_id") < 10, 3, prefix = "spec_ann").collect().toSeq
    assert(freshIvf.nonEmpty && servedIvf == freshIvf)

    val freshPq = VectorSearch.pqTopK(emb, codebook,
      col("vec_id") < 10, 5, dim = Dim).collect().toSeq
    val servedPq = AnnIndex.servedPqTopK(spark, emb,
      col("vec_id") < 10, 5, dim = Dim, prefix = "spec_ann")
      .collect().toSeq
    assert(freshPq.nonEmpty && servedPq == freshPq)

    val freshSq = VectorSearch.sqTopK(emb, Dim).collect().toSeq
    val servedSq = AnnIndex.servedSqTopK(spark, emb, Dim,
      prefix = "spec_ann").collect().toSeq
    assert(freshSq.nonEmpty && servedSq == freshSq)
  }

  test("published artifacts are index-sized tables, not corpus copies") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val nc = spark.table(AnnIndex.ivfTable("spec_ann")).count()
    assert(nc > 0 && nc < n / 10)
    assert(spark.table(AnnIndex.sqTable("spec_ann")).count() == 1)
  }
}
