package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine as the exact baseline, and an IVF-style
  * centroid-partitioned variant as the scale path. Dot products are
  * sequential left-fold double accumulations (zip_with + aggregate) —
  * codegen'd, UDF-free, and bit-reproducible in any engine with an
  * ordered list fold.
  */
object VectorSearch {

  /** Dot product of two float vectors in double via the native
    * codegen'd [[graft.functions.DotProduct]] expression (registered
    * by GraftSession through SparkSessionExtensions). Accumulates
    * left-to-right in double — bit-identical to a zip_with+aggregate
    * fold and to the DuckDB list_reduce oracles, but without the
    * per-row intermediate array. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  private def withNorm(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))

  /** All pairs (v1 < v2) with cosine ≥ threshold, by blocked self-join.
    * Quadratic — the exact baseline for small/medium sets and the
    * oracle for the approximate paths. */
  def cosineNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = withNorm(embeddings)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"), col("nrm").as("n2"))
    a.crossJoin(b)
      .where(col("v1") < col("v2"))
      .withColumn("cos", cosine(col("e1"), col("e2"), col("n1"), col("n2")))
      .where(col("cos") >= threshold)
      .select(col("v1"), col("v2"), round(col("cos"), 6).as("cos"))
      .orderBy(col("v1"), col("v2"))
  }

  /** Brute-force top-k: for each query vector, the k nearest others by
    * cosine (desc, vec_id tiebreak). The query side is broadcast — the
    * corpus is scanned once regardless of query count. */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = withNorm(embeddings)
    val q = withNorm(queries).select(
      col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_exact"), asc("vec_id"))
    broadcast(q).crossJoin(corpus)
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos_exact", cosine(col("qe"), col("embedding"), col("qn"), col("nrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos_exact"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic centroid assignment: nearest centroid by cosine
    * (centroid_id tiebreak). Centroids are broadcast — assignment is a
    * map-side pass over the corpus, the scale path for IVF. */
  def assignCells(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val e = withNorm(embeddings)
    val c = withNorm(centroids).select(
      col("vec_id").as("centroid_id"), col("embedding").as("ce"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(desc("ccos"), asc("centroid_id"))
    e.crossJoin(broadcast(c))
      .withColumn("ccos", cosine(col("embedding"), col("ce"), col("nrm"), col("cn")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("centroid_id"))
  }

  /** Lloyd iterations for IVF centroid training: assign every vector
    * to its nearest centroid (broadcast), recompute each non-empty
    * cell's centroid as the elementwise mean. Each iteration is one
    * map-side assignment pass + one (centroid, dim) aggregation —
    * linear in corpus size, the standard distributed k-means shape.
    * Returns (centroid_id, embedding). */
  def trainCentroids(embeddings: DataFrame, initial: DataFrame,
                     iterations: Int): DataFrame = {
    var centroids = initial.select(col("vec_id").as("centroid_id"), col("embedding"))
    (0 until iterations).foreach { _ =>
      val assigned = assignCells(embeddings,
        centroids.select(col("centroid_id").as("vec_id"), col("embedding")))
      centroids = assigned
        .select(col("centroid_id"), posexplode(col("embedding")))
        .toDF("centroid_id", "pos", "x")
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          p => p.getField("m").cast("float")).as("embedding"))
    }
    centroids
  }

  /** IVF top-k: search only the query's cell (nprobe=1). Approximate
    * by construction; deterministic given the centroid set, so an
    * engine-independent oracle can replay the same algorithm. */
  def ivfTopK(embeddings: DataFrame, centroids: DataFrame,
              queryFilter: Column, k: Int): DataFrame = {
    val assigned = assignCells(embeddings, centroids)
    val q = assigned.where(queryFilter).select(
      col("vec_id").as("query_id"), col("embedding").as("qe"),
      col("nrm").as("qn"), col("centroid_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_exact"), asc("vec_id"))
    broadcast(q).join(assigned, Seq("centroid_id"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos_exact", cosine(col("qe"), col("embedding"), col("qn"), col("nrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos_exact"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }
}
