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

  test("ivfPqTopK with all cells probed equals flat pqTopK; nprobe=1 stays well-formed") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.where(col("vec_id") % 50 === 0)
    // every corpus vector in the testdata is nonzero-norm, so the
    // assigned corpus == the flat corpus; probing every cell must then
    // reproduce flat PQ bit-for-bit (same codes, same ADC, same cut)
    val nCells = centroids.count().toInt
    val flat = VectorSearch.pqTopK(emb, centroids,
      col("vec_id") < 10, 5, dim = Dim).collect().toSeq
    val allCells = VectorSearch.ivfPqTopK(emb, centroids, centroids,
      col("vec_id") < 10, 5, dim = Dim, nprobe = nCells).collect().toSeq
    assert(flat.nonEmpty && allCells == flat)
    // nprobe=1: at most k neighbors per query, ranks contiguous from 1
    val p1 = VectorSearch.ivfPqTopK(emb, centroids, centroids,
      col("vec_id") < 10, 5, dim = Dim, nprobe = 1).collect()
      .groupBy(_.getLong(0))
    assert(p1.nonEmpty)
    p1.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length))
    }
  }

  test("served IVF-PQ equals train-fresh ivfPqTopK bit-for-bit, with zero training work") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.where(col("vec_id") % 50 === 0)
    val codebook = emb.where(col("vec_id") % 70 === 0)
    AnnIndex.publishIvfPq(emb, centroids, codebook, dim = Dim,
      prefix = "spec_ann_ivfpq")
    val fresh = VectorSearch.ivfPqTopK(emb, centroids, codebook,
      col("vec_id") < 10, 5, dim = Dim, nprobe = 2).collect().toSeq
    val served = AnnIndex.servedIvfPqTopK(spark, emb,
      col("vec_id") < 10, 5, dim = Dim, nprobe = 2,
      prefix = "spec_ann_ivfpq").collect().toSeq
    assert(fresh.nonEmpty && served == fresh)
    // the published codes table is corpus-cardinality but code-width:
    // one row per nonzero-norm vector, cell + m int codes, no floats
    val codes = spark.table(AnnIndex.ivfPqCodesTable("spec_ann_ivfpq"))
    assert(codes.count() == emb.count())
    assert(codes.columns.toSeq ==
      Seq("vec_id", "cell", "c0", "c1", "c2", "c3"))
    assert(!codes.schema.exists(_.dataType.typeName.contains("array")))
  }

  test("streamed serve equals the batch served top-k on finalized windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.where(col("vec_id") % 50 === 0)
    AnnIndex.publish(emb, centroids, centroids, Dim, prefix = "spec_ann_s")
    val batch = AnnIndex.servedIvfTopK(spark, emb, col("vec_id") < 10,
        3, nprobe = 2, prefix = "spec_ann_s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(batch.nonEmpty)
    val qRows = emb.where(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1),
        Timestamp.valueOf("2024-01-01 10:00:00")))
    val mem = MemoryStream[(Long, Seq[Float], Timestamp)]
    mem.addData(qRows.toIndexedSeq: _*)
    val q = AnnIndex.servedIvfTopKStream(spark,
        mem.toDF().toDF("query_id", "embedding", "ts"), emb,
        k = 3, nprobe = 2, prefix = "spec_ann_s")
      .writeStream.format("memory").queryName("eq_ann_serve")
      .outputMode("append").start()
    q.processAllAvailable()
    // sentinel far past the watermark finalizes the real window — a
    // VALID (nonzero) query: degenerate rows are filtered below the
    // watermark node by predicate pushdown and advance no event time
    // (the operator's documented caveat)
    mem.addData((999999L, Seq.fill(Dim)(1.0f),
      new Timestamp(Timestamp.valueOf("2024-01-01 10:00:00").getTime
        + 10L * 3600 * 1000)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eq_ann_serve")
      .where(col("query_id") =!= 999999L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .toSet
    assert(streamed == batch,
      "finalized streamed top-k must equal the served batch top-k")
  }

  test("streamed IVF-PQ serve equals the batch served top-k on finalized windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = emb.where(col("vec_id") % 50 === 0)
    val codebook = emb.where(col("vec_id") % 70 === 0)
    AnnIndex.publishIvfPq(emb, centroids, codebook, dim = Dim,
      prefix = "spec_ann_ivfpq_s")
    val batch = AnnIndex.servedIvfPqTopK(spark, emb, col("vec_id") < 10,
        5, dim = Dim, nprobe = 2, prefix = "spec_ann_ivfpq_s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(batch.nonEmpty)
    val qRows = emb.where(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1),
        Timestamp.valueOf("2024-01-01 10:00:00")))
    val mem = MemoryStream[(Long, Seq[Float], Timestamp)]
    mem.addData(qRows.toIndexedSeq: _*)
    val q = AnnIndex.servedIvfPqTopKStream(spark,
        mem.toDF().toDF("query_id", "embedding", "ts"),
        k = 5, dim = Dim, nprobe = 2, prefix = "spec_ann_ivfpq_s")
      .writeStream.format("memory").queryName("eq_ivfpq_serve")
      .outputMode("append").start()
    q.processAllAvailable()
    mem.addData((999999L, Seq.fill(Dim)(1.0f),
      new Timestamp(Timestamp.valueOf("2024-01-01 10:00:00").getTime
        + 10L * 3600 * 1000)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eq_ivfpq_serve")
      .where(col("query_id") =!= 999999L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
      .toSet
    assert(streamed == batch,
      "finalized streamed IVF-PQ top-k must equal the batch served top-k")
  }

  test("published artifacts are index-sized tables, not corpus copies") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val nc = spark.table(AnnIndex.ivfTable("spec_ann")).count()
    assert(nc > 0 && nc < n / 10)
    assert(spark.table(AnnIndex.sqTable("spec_ann")).count() == 1)
  }
}
