package graft.operators

import org.apache.spark.internal.Logging
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
object VectorSearch extends Logging {

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

  /** Embedding-column health QA: the preflight every vector operator
    * in this file assumes has already run — NULL embeddings, wrong
    * dimensionality, zero norms (excluded by the cosine operators;
    * this says HOW MANY were excluded) and non-finite components
    * (NaN/Inf poison every distance silently). One row of counts plus
    * min/max norm² over the healthy vectors. Bit-portable by
    * construction: counts are integers, norm² is the same sequential
    * double fold as graft_dot on both engines, and min/max (unlike a
    * sum of doubles) are order-independent. Plan: row-local checks
    * into one map-side-combine aggregate — a single scan, no shuffle
    * of anything vector-sized. */
  def vectorHealth(embeddings: DataFrame, expectedDim: Int): DataFrame = {
    val e = col("embedding")
    val nonfinite = exists(e, x => isnan(x) || x === Float.PositiveInfinity ||
      x === Float.NegativeInfinity)
    val checked = embeddings.select(
      e.isNull.cast("long").as("is_null"),
      (e.isNotNull && size(e) =!= expectedDim).cast("long").as("wrong_dim"),
      (e.isNotNull && nonfinite).cast("long").as("is_nonfinite"),
      when(e.isNotNull && size(e) === expectedDim && !nonfinite,
        dot(e, e)).as("norm2"))
    checked.agg(
      count(lit(1)).as("n_vecs"),
      sum(col("is_null")).as("n_null"),
      sum(col("wrong_dim")).as("n_wrong_dim"),
      sum(col("is_nonfinite")).as("n_nonfinite"),
      coalesce(sum((col("norm2") === 0.0).cast("long")), lit(0L))
        .as("n_zero_norm"),
      min(col("norm2")).as("min_norm2"),
      max(col("norm2")).as("max_norm2"))
  }

  /** Int8 (256-level) per-dimension min/max embedding quantization
    * with a reconstruction-error report — the 4×-memory-compression
    * pass that makes a 100 TB ANN index RAM-resident (PQ's scalar
    * cousin: PQ compresses subspaces to centroid ids, this compresses
    * each dimension to a byte; serving stacks run scalar quantization
    * first because decode is two flops). Pass 1 aggregates per-dim
    * lo/hi over healthy vectors (64 rows out however large the
    * corpus, map-side combined) and packs them into one broadcast
    * row; pass 2 quantizes row-locally and reports per vector the
    * integer code checksum, max absolute reconstruction error
    * (order-independent max) and squared error folded in index order
    * — every float op is an identical expression tree in the DuckDB
    * oracle, so the gate hash-matches doubles exactly. Codes are
    * exact integers; a degenerate lo=hi dimension quantizes to 0 with
    * zero error. */
  /** Healthy-vector filter shared by the quantization pair: non-null,
    * expected dim, all components finite. */
  private def healthyVecs(embeddings: DataFrame, expectedDim: Int): DataFrame = {
    val e = col("embedding")
    val nonfinite = exists(e, x => isnan(x) || x === Float.PositiveInfinity ||
      x === Float.NegativeInfinity)
    embeddings.where(e.isNotNull && size(e) === expectedDim && !nonfinite)
  }

  /** One-row (mins, maxs) per-dimension stats frame over healthy
    * vectors — the broadcast side of both quantization operators. */
  private def dimStats(healthy: DataFrame): DataFrame =
    healthy
      .select(posexplode(col("embedding")).as(Seq("d0", "v")))
      .groupBy(col("d0"))
      .agg(min(col("v").cast("double")).as("lo"),
        max(col("v").cast("double")).as("hi"))
      .agg(array_sort(collect_list(struct(col("d0"), col("lo"), col("hi"))))
        .as("st"))
      .select(transform(col("st"), s => s.getField("lo")).as("mins"),
        transform(col("st"), s => s.getField("hi")).as("maxs"))

  private def loAt(i: Column) = element_at(col("mins"), i + 1)
  private def rngAt(i: Column) = element_at(col("maxs"), i + 1) - loAt(i)

  /** The int8 code array for the row's embedding (requires the
    * [[dimStats]] columns in scope). */
  private def sqCodes(expectedDim: Int): Column = {
    def vAt(i: Column) = element_at(col("embedding"), i + 1).cast("double")
    transform(sequence(lit(0), lit(expectedDim - 1)), i =>
      when(rngAt(i) === 0.0, lit(0L))
        .otherwise(floor((vAt(i) - loAt(i)) / rngAt(i) * 255 + 0.5)))
  }

  /** Fused quantize→dequantize→float straight from `embedding` — the
    * same arithmetic as [[sqCodes]] then the decode
    * (floor(x·255+0.5) is the stored code; identical doubles, so the
    * oracle's two-CTE replay is unchanged), in ONE transform with no
    * intermediate `codes` column. The column reference is the point:
    * projection collapse inlines a referenced array column's FULL
    * transform into every element of the referencing one — the
    * codes→decode→cast chain evaluated O(dim²) interpreted ops per
    * row and measured 8.6 s on 2000×64 vectors; fused it is O(dim). */
  private def sqDequantF(expectedDim: Int): Column = {
    def vAt(i: Column) = element_at(col("embedding"), i + 1).cast("double")
    transform(sequence(lit(0), lit(expectedDim - 1)), i =>
      (when(rngAt(i) === 0.0, loAt(i))
        .otherwise(loAt(i) +
          floor((vAt(i) - loAt(i)) / rngAt(i) * 255 + 0.5) / lit(255) *
            rngAt(i)))
        .cast("float"))
  }

  def quantizeReport(embeddings: DataFrame, expectedDim: Int): DataFrame = {
    val e = col("embedding")
    val healthy = healthyVecs(embeddings, expectedDim)
    val packed = dimStats(healthy)
    def vAt(i: Column) = element_at(e, i + 1).cast("double")
    healthy.crossJoin(broadcast(packed))
      .withColumn("codes", sqCodes(expectedDim))
      // the reconstruction re-derives the code in-element (identical
      // floor) instead of element_at(codes, ·) — a codes reference
      // inside this transform would inline the whole codes transform
      // per element (the O(dim²) projection-collapse trap sqDequantF
      // documents)
      .withColumn("errs",
        transform(sequence(lit(0), lit(expectedDim - 1)), i =>
          abs(vAt(i) - when(rngAt(i) === 0.0, loAt(i))
            .otherwise(loAt(i) +
              floor((vAt(i) - loAt(i)) / rngAt(i) * 255 + 0.5) / lit(255) *
                rngAt(i)))))
      .select(col("vec_id"),
        aggregate(col("codes"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_max(col("errs")).as("max_abs_err"),
        aggregate(col("errs"), lit(0.0), (a, x) => a + x * x).as("sse"))
      .orderBy(col("vec_id"))
  }

  /** ANN top-k over the int8-quantized corpus (asymmetric distance:
    * full-precision query × dequantized corpus — SQ's version of PQ's
    * ADC). The search-side payoff of [[quantizeReport]]: the corpus
    * the scorer scans is code arrays + one broadcast stats row — a
    * quarter of the float footprint, which is what decides whether
    * the index fits executor memory at 10⁹ vectors. Scores differ
    * from exact cosine only by the reconstruction error the
    * quantization report already bounds. The dequantized vector casts
    * back to float32 (IEEE round — DuckDB `CAST AS FLOAT` agrees
    * bit-for-bit) so every per-PAIR product runs through the
    * codegen'd `graft_dot` — the first cut folded doubles through
    * interpreted array HOFs per pair and measured 135 s at the sf1
    * probe; float-cast + native dot is the same contract at scan
    * speed. Same determinism as [[bruteForceTopK]] (ties by neighbor
    * id, zero-norm reconstructions excluded); the oracle replays
    * dequantize + float cast + fold + window. At scale the scan is
    * sharded by the same IVF cells as the full-precision path. */
  def sqTopK(embeddings: DataFrame, expectedDim: Int,
             nQueries: Int = 10, k: Int = 5): DataFrame =
    sqTopKWith(embeddings, expectedDim, sqStats(embeddings, expectedDim),
      nQueries, k)

  /** The SQ index artifact: one-row per-dimension (mins, maxs) over
    * healthy vectors — what [[graft.operators.AnnIndex]] persists so
    * serving never re-scans the corpus for stats. */
  def sqStats(embeddings: DataFrame, expectedDim: Int): DataFrame =
    dimStats(healthyVecs(embeddings, expectedDim))

  /** [[sqTopK]] against a CALLER-PROVIDED stats frame (freshly
    * computed or read back from a persisted index — bit-identical
    * either way, since the stats are exact min/max doubles). */
  def sqTopKWith(embeddings: DataFrame, expectedDim: Int,
                 stats: DataFrame, nQueries: Int = 10,
                 k: Int = 5): DataFrame = {
    val healthy = healthyVecs(embeddings, expectedDim)
    val packed = stats
    // persisted: this IS the index build — without it projection
    // collapse inlines the interpreted decode transforms into the
    // per-PAIR join projection (measured 83 s at the sf1 probe; the
    // cached index scans in ~1 s). Cache lifetime is caller-owned,
    // like the other shared frames.
    val corpus = healthy.crossJoin(broadcast(packed))
      .withColumn("dqf", sqDequantF(expectedDim))
      .select(col("vec_id"), col("dqf"))
      .withColumn("dn", sqrt(dot(col("dqf"), col("dqf"))))
      .where(col("dn") =!= 0.0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = healthy.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
      .where(col("qn") =!= 0.0)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_sq"), asc("vec_id"))
    broadcast(q).crossJoin(corpus)
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos_sq",
        dot(col("qe"), col("dqf")) / (col("qn") * col("dn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("cos_sq"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** All pairs (v1 < v2) with cosine ≥ threshold, by blocked self-join.
    * Quadratic — the exact baseline for small/medium sets and the
    * oracle for the approximate paths. Zero-norm vectors are excluded
    * (cosine is undefined for them; engines disagree on 0/0 — see
    * [[srpNearDup]]), mirrored by the oracle's `nrm <> 0`. */
  def cosineNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = withNorm(embeddings).where(col("nrm") =!= 0.0)
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

  /** Filtered exact top-k: nearest neighbors among vectors sharing
    * the QUERY's label — the "search within my tenant/class" shape
    * every production vector store serves. The filter joins INTO the
    * candidate generation (a label equi-join replaces the cross
    * join): pre-filtering, so every query gets its full k from its
    * own stratum — the post-filtering formulation (rank globally,
    * filter after) silently returns < k results exactly when the
    * stratum is small, which is when the caller cares most. At scale
    * the label is the natural co-partition key: candidates shrink to
    * the stratum size and the broadcast query side never shuffles the
    * corpus. Ranking/tie-break/rounding contract identical to
    * [[bruteForceTopK]]. */
  def filteredTopK(embeddings: DataFrame, queries: DataFrame,
                   k: Int): DataFrame = {
    def normed(df: DataFrame) = df.select(col("vec_id"), col("label"),
      col("embedding"), norm(col("embedding")).as("nrm"))
    val corpus = normed(embeddings)
    val q = normed(queries).select(col("vec_id").as("query_id"),
      col("label").as("qlabel"), col("embedding").as("qe"),
      col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_exact"), asc("vec_id"))
    broadcast(q).join(corpus, col("qlabel") === col("label"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos_exact",
        cosine(col("qe"), col("embedding"), col("qn"), col("nrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("qlabel").as("label"),
        col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos_exact"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic centroid assignment: nearest centroid by cosine
    * (min centroid_id on ties). Centroids are broadcast; the argmax
    * runs as a `graft_topk(…, 1)` bounded-heap aggregate over a SLIM
    * (vec_id, centroid_id, ccos) projection of the broadcast-nested-
    * loop expansion — the embedding arrays are dropped BEFORE the
    * aggregate and joined back by vec_id afterwards.
    *
    * Why not max_by/first: both are declarative aggregates whose
    * buffers hold a struct/array, and Spark's HashAggregate cannot
    * host complex-typed declarative buffers — the planner silently
    * falls back to SortAggregate, which SORTS the corpus × centroids
    * pair frame (with the arrays riding along) on both sides of the
    * exchange. The round-9 100× probe measured that fallback at 297 s
    * for a 200k × 448 assignment; the typed-imperative topk heap
    * (ObjectHashAggregate, map-side combined, same (cos DESC, id ASC)
    * tiebreak) plus one AQE-sized vec_id join measures ~20 s on the
    * same data. All candidate rows for a vector sit in one map
    * partition, so partials collapse to one row per vector before the
    * only corpus-keyed exchange; the pair frame is never shuffled and
    * never sorted. */
  def assignCells(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    // zero-norm vectors/centroids have no defined cosine (NULL here,
    // inf/NaN in IEEE engines) — exclude them from the index rather
    // than let engine-specific null/NaN ordering pick their cells
    val e = withNorm(embeddings).where(col("nrm") =!= 0.0)
    // The argmax runs as ONE native row-local expression over a
    // plan-time centroid table ([[graft.functions.CellArgmax]] — the
    // SrpBandSigs reference-object pattern): the previous broadcast
    // cross join fanned every vector to |centroids| rows, paid a topk
    // hash aggregate over that √n-times-corpus fan-out, then re-joined
    // the corpus to itself to recover the embedding — measured ~80 s
    // CPU per assignment stage at the 100× probe, twice per trained
    // ANN query. Collecting the centroid frame here moves the same
    // √n-sized rows the broadcast shipped anyway (≈8 MB at 10⁹
    // vectors); at stream-serve time the centroids are the published
    // (bounded) index table, same contract.
    val cRows = withNorm(centroids).where(col("nrm") =!= 0.0)
      .select(col("vec_id"), col("embedding"), col("nrm")).collect()
    if (cRows.isEmpty) {
      // no valid centroid: nothing is assignable (the old inner join
      // against an empty cell frame) — keep the output schema
      e.where(lit(false))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          lit(null).cast("bigint").as("centroid_id"))
    } else {
      import org.apache.spark.sql.GraftExpressionBridge
      val argmax = GraftExpressionBridge.column(graft.functions.CellArgmax(
        GraftExpressionBridge.expression(col("embedding")),
        GraftExpressionBridge.expression(col("nrm")),
        cRows.map(_.getLong(0)),
        cRows.map(_.getSeq[Float](1).toArray),
        cRows.map(_.getDouble(2))))
      e.select(col("vec_id"), col("embedding"), col("nrm"),
        argmax.as("centroid_id"))
    }
  }

  /** Lloyd iterations for IVF centroid training: assign every vector
    * to its nearest centroid (broadcast), recompute each non-empty
    * cell's centroid as the elementwise mean. Each iteration is one
    * map-side assignment pass + one (centroid, dim) aggregation —
    * linear in corpus size, the standard distributed k-means shape.
    * Returns (centroid_id, embedding).
    *
    * Bit-portable means: coordinates quantize to integer micro-units
    * (round(x·10⁶) — the [[dimensionStats]] grid; float32 inputs
    * carry ~7 significant digits, so the quantization sits below
    * input noise) and fold as exact BIGINT sums, so the mean is
    * summation-ORDER-independent — a raw double avg() would make the
    * trained centroids (and every cosine ranked against them) depend
    * on partitioning, which no hash-gated oracle could replay. The
    * mean is then the fixed expression CAST(s AS DOUBLE)/n/10⁶ →
    * FLOAT, identical in any engine. BIGINT Σq wraps only past ~10¹²
    * members per cell (|q| ≤ ~10⁶ for unit-scale embeddings) —
    * cells are N/√N = √N-sized under [[centroidStrideFor]]. */
  def trainCentroids(embeddings: DataFrame, initial: DataFrame,
                     iterations: Int): DataFrame = {
    var centroids = initial.select(col("vec_id").as("centroid_id"), col("embedding"))
    (0 until iterations).foreach { _ =>
      val assigned = assignCells(embeddings,
        centroids.select(col("centroid_id").as("vec_id"), col("embedding")))
      centroids = assigned
        .select(col("centroid_id"), posexplode(col("embedding")))
        .toDF("centroid_id", "pos", "x")
        .withColumn("q", round(col("x").cast("double") * 1000000).cast("bigint"))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s").cast("double") / col("n").cast("double") /
              lit(1000000.0)).as("m")))),
          p => p.getField("m").cast("float")).as("embedding"))
        // materialize the (tiny) centroid frame and truncate lineage:
        // without this, iteration i's plan re-executes iterations
        // 0..i-1, so Lloyd costs O(iterations²) corpus passes
        .localCheckpoint()
    }
    centroids
  }

  /** Approximation-quality evaluation for the embedding near-dup
    * paths: pair-level precision/recall of [[srpNearDup]] (the scale
    * path) against [[cosineNearDup]] (the exact baseline) at the same
    * threshold — "measure, don't guess" as a first-class query. At
    * 100 TB this runs on a held-out SAMPLE (the exact leg is
    * quadratic by design); the number it produces is what justifies
    * trusting the banded path on the full corpus, and a recall drop
    * after a parameter change is a gate event, not a silent skew.
    * One full-outer join of the two (small) pair sets; counts are
    * integer sums, the two ratios exact IEEE divisions. */
  def nearDupRecall(embeddings: DataFrame, threshold: Double,
                    corpusCount: Option[Long] = None): DataFrame = {
    val exact = cosineNearDup(embeddings, threshold)
      .select(col("v1"), col("v2"), lit(1).as("in_exact"))
    val approx = srpNearDup(embeddings, threshold, corpusCount = corpusCount)
      .select(col("v1"), col("v2"), lit(1).as("in_approx"))
    exact.join(approx, Seq("v1", "v2"), "full_outer")
      .agg(
        coalesce(sum(col("in_exact")), lit(0L)).as("n_exact"),
        coalesce(sum(col("in_approx")), lit(0L)).as("n_approx"),
        coalesce(sum(col("in_exact") * col("in_approx")), lit(0L))
          .as("n_both"))
      .withColumn("precision",
        col("n_both").cast("double") / nullif(col("n_approx"), lit(0L)))
      .withColumn("recall",
        col("n_both").cast("double") / nullif(col("n_exact"), lit(0L)))
  }

  /** ANN recall@k: per-query overlap of the IVF top-k with the exact
    * brute-force top-k at the same k and tie-breaks (desc cosine,
    * asc vec_id) — the serving-quality twin of [[nearDupRecall]].
    * recall < 1 on a query localizes cell-boundary loss (true
    * neighbors assigned to cells the probe never visited — raise
    * `nprobe` or retrain centroids); n_approx < k localizes thin
    * cells. The brute leg is LINEAR (fixed query set × corpus,
    * broadcast queries), so unlike the all-pairs evaluators this one
    * runs corpus-wide at any scale. Output one row per query:
    * (query_id, n_exact, n_approx, n_both, recall). */
  def annRecall(embeddings: DataFrame, centroids: DataFrame,
                queryFilter: Column, k: Int, nprobe: Int = 1): DataFrame = {
    val exact = bruteForceTopK(embeddings, embeddings.where(queryFilter), k)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("in_exact"))
    val approx = ivfTopK(embeddings, centroids, queryFilter, k, nprobe)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("in_approx"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "full_outer")
      .groupBy(col("query_id"))
      .agg(
        coalesce(sum(col("in_exact")), lit(0L)).as("n_exact"),
        coalesce(sum(col("in_approx")), lit(0L)).as("n_approx"),
        coalesce(sum(col("in_exact") * col("in_approx")), lit(0L))
          .as("n_both"))
      .withColumn("recall",
        col("n_both").cast("double") / nullif(col("n_exact"), lit(0L)))
      .orderBy(col("query_id"))
  }

  /** Centroid count for [[semanticDedup]] at a given corpus size: the
    * cell count must scale WITH the corpus (k ≈ N / targetCell) or the
    * within-cell pair stage degrades quadratically — fixed k means
    * N²/k pair work, k ∝ N means N·targetCell. The same
    * derive-from-the-corpus contract as [[srpParamsFor]]: defaults
    * that were tuned at gate scale must not silently become a blowup
    * at 100 TB. Train/seed that many centroids (e.g. every
    * (N/k)-th vec_id, or [[trainCentroids]] on a sample). Broadcast
    * bound: k centroids ship to every task — beyond ~10⁶ centroids
    * (hundreds of MB) switch the assignment to a two-level hierarchy
    * (assign to √k coarse cells, then √k fine within); the pair stage
    * is unchanged. */
  def semanticCentroidCountFor(corpusCount: Long,
                               targetCell: Int = 1024): Int = {
    require(corpusCount > 0 && targetCell > 0)
    val k = math.max(1L, math.ceil(corpusCount.toDouble / targetCell).toLong)
    // fail loud rather than silently cap: a capped k quietly re-grows
    // the cells past targetCell, which is exactly the blowup this
    // function exists to prevent — raise targetCell instead
    require(k <= Int.MaxValue,
      s"corpusCount=$corpusCount / targetCell=$targetCell needs $k cells " +
        "(> Int.MaxValue); raise targetCell")
    k.toInt
  }

  /** Corpus-derived centroid-seed stride: every `stride`-th vec_id
    * seeds a cell, with `stride ≈ √n` so the cell count grows as √n —
    * the knee of both curves this family pays: IVF assignment is
    * n·cells and in-cell quadratic work is cells·(n/cells)², so
    * cells = √n makes BOTH n^1.5, the blocked-quadratic optimum (a
    * FIXED stride grows cells linearly and assignment quadratically —
    * measured 12–21× at the 10× sf1 probe before this derivation; a
    * FIXED cell count blows up the in-cell quadratic instead). Same
    * derive-from-the-corpus contract as `Linkage.blockCharsFor` /
    * `Affinity.wedgeSupportFor`: the oracle replays
    * `round(sqrt(count(*)))` in SQL off the same table, so stride
    * drift is a gate event. Rounding note: `sqrt(n)` can never land
    * exactly on .5 for integral n ((k+.5)² is never integral), so
    * JVM and SQL half-away rounding are always identical here. */
  def centroidStrideFor(corpusCount: Long): Long = {
    require(corpusCount > 0, "corpus must be non-empty")
    math.max(1L, math.round(math.sqrt(corpusCount.toDouble)))
  }

  /** SemDeDup-style semantic dedup: assign every vector to its nearest
    * centroid ([[assignCells]] — broadcast centroids, map-side argmax),
    * then mark a vector a duplicate iff a LOWER-id vector in the SAME
    * cell has cosine ≥ `threshold` (dup_of = the smallest such id, so
    * survivors are deterministic min-id representatives). The
    * cluster-then-compare shape from the SemDeDup paper (Abbas et al.,
    * 2023): the quadratic pair comparison is confined to one cell,
    * turning the all-pairs O(N²) into Σ|cell|² — with N/k-sized cells
    * that is N²/k, and at 100 TB the cell count scales with the corpus
    * so per-cell work stays bounded. Both self-join sides read ONE
    * persisted assignment frame (the corpus × centroids argmax runs
    * once, not three times); the join key is centroid_id, one shuffle
    * each side. Zero-norm vectors are excluded by assignCells on both
    * engine and oracle sides (cosine undefined). */
  def semanticDedup(embeddings: DataFrame, centroids: DataFrame,
                    threshold: Double): DataFrame = {
    // CALLER OWNS the cache lifetime (same contract as searchTopK):
    // the returned frame is lazy, so the persist can't be released
    // here — repeated calls in a long-lived session must clearCache()
    // or unpersist the delta (as Bench.main does) between calls
    val assigned = assignCells(embeddings, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lo = assigned.select(col("centroid_id"), col("vec_id").as("v1"),
      col("embedding").as("e1"), col("nrm").as("n1"))
    val hi = assigned.select(col("centroid_id"), col("vec_id").as("v2"),
      col("embedding").as("e2"), col("nrm").as("n2"))
    val dups = lo.join(hi, Seq("centroid_id"))
      .where(col("v1") < col("v2"))
      .where(cosine(col("e1"), col("e2"), col("n1"), col("n2"))
        >= threshold)
      .groupBy(col("v2").as("vec_id"))
      .agg(min(col("v1")).as("dup_of"))
    assigned.select(col("vec_id"), col("centroid_id"))
      .join(dups, Seq("vec_id"), "left_outer")
      .withColumn("is_dup", col("dup_of").isNotNull.cast("int"))
      .select(col("vec_id"), col("centroid_id"), col("is_dup"), col("dup_of"))
      .orderBy(col("vec_id"))
  }

  /** IVF top-k: search the query's `nprobe` nearest cells. Approximate
    * by construction; deterministic given the centroid set, so an
    * engine-independent oracle can replay the same algorithm. Corpus
    * vectors live in exactly one cell (nprobe applies to the query
    * side only), so no neighbor is scored twice. The query side stays
    * tiny (it is exploded to nprobe rows per query, then broadcast);
    * the corpus is scanned once and only candidate cells are ranked.
    * The final top-k row_number window partitions by query_id —
    * bounded by the broadcastable query count, never corpus-sized. */
  def ivfTopK(embeddings: DataFrame, centroids: DataFrame,
              queryFilter: Column, k: Int, nprobe: Int = 1): DataFrame = {
    val assigned = assignCells(embeddings, centroids)
    val c = withNorm(centroids).select(
      col("vec_id").as("centroid_id"), col("embedding").as("ce"), col("nrm").as("cn"))
    // top-nprobe cells per query, row-locally: sort the (neg cos,
    // centroid_id) structs and keep the prefix — no window. Queries
    // are filtered from the RAW embeddings (the filter pushes to the
    // scan), not from `assigned` — deriving them from the assignment
    // would execute the corpus × centroids pass a second time just to
    // select the query rows.
    val qcells = withNorm(embeddings.where(queryFilter))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
      .crossJoin(broadcast(c))
      .withColumn("ccos", cosine(col("qe"), col("ce"), col("qn"), col("cn")))
      // a zero-norm (degenerate) centroid yields NULL cosine, and
      // negate(NULL) would sort FIRST in the struct sort — drop such
      // cells so they are never probed (the desc/nulls-last ordering
      // this replaced put them last)
      .where(col("ccos").isNotNull)
      .groupBy(col("query_id"))
      .agg(first(col("qe")).as("qe"), first(col("qn")).as("qn"),
        slice(sort_array(collect_list(struct(
          negate(col("ccos")).as("nc"), col("centroid_id").as("cid")))),
          1, nprobe).as("cells"))
      .select(col("query_id"), col("qe"), col("qn"),
        explode(col("cells.cid")).as("centroid_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_exact"), asc("vec_id"))
    broadcast(qcells).join(assigned, Seq("centroid_id"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos_exact", cosine(col("qe"), col("embedding"), col("qn"), col("nrm")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos_exact"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** ANN recall@k CURVE: pooled recall and precision of the IVF
    * top-max(k) lists against the exact brute-force lists at each
    * checkpoint k — the serving-tuning table behind [[annRecall]]'s
    * single-k per-query rows (pick k where the curve flattens; a
    * curve that sags only at small k means cell-boundary loss near
    * the top, which multi-probe fixes, while a uniform sag means the
    * centroids need retraining). Both rank lists share the exact
    * tie-break (cos desc, vec_id asc), so every count is an exact
    * integer and the two ratios are single IEEE divisions.
    *
    * Shape: the two top-max(k) legs run once ([[bruteForceTopK]]'s
    * brute leg is linear — fixed queries × corpus, broadcast
    * queries); the full-outer pair join and the per-k conditional
    * counts run over (queries × max k) rows — grid-sized at any
    * corpus scale. */
  def annRecallCurve(embeddings: DataFrame, centroids: DataFrame,
                     queryFilter: Column, ks: Seq[Int],
                     nprobe: Int = 1): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), "ks must be positive")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val maxK = ks.max
    val exact = bruteForceTopK(embeddings, embeddings.where(queryFilter),
      maxK).select(col("query_id"), col("neighbor_id"),
      col("rank").as("erk"))
    val approx = ivfTopK(embeddings, centroids, queryFilter, maxK, nprobe)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("ark"))
    val joined = exact
      .join(approx, Seq("query_id", "neighbor_id"), "full_outer")
    ks.sorted.map(_.toLong).toDF("k").crossJoin(joined)
      .groupBy(col("k"))
      .agg(
        sum(when(col("erk") <= col("k"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("ark") <= col("k"), 1L).otherwise(0L)).as("n_approx"),
        sum(when(col("erk") <= col("k") && col("ark") <= col("k"), 1L)
          .otherwise(0L)).as("n_both"))
      .select(col("k"), col("n_exact"), col("n_approx"), col("n_both"),
        (col("n_both").cast("double") /
          nullif(col("n_exact").cast("double"), lit(0.0))).as("recall"),
        (col("n_both").cast("double") /
          nullif(col("n_approx").cast("double"), lit(0.0)))
          .as("precision"))
      .orderBy(col("k"))
  }

  /** Per-dimension embedding statistics: mean, population std,
    * min/max and exact-zero share of every coordinate — the
    * dimension-grain refinement of [[vectorHealth]]'s corpus row:
    * a dead dimension (std≈0), a scale-runaway one (max ≫ others)
    * or a sparsity spike (zero share) all poison cosine geometry
    * and are invisible in whole-vector norms.
    *
    * Determinism: coordinates quantize to integer micro-units
    * (round(v·10⁶) — float32 inputs carry ~7 significant digits, so
    * micro-quantization is far below input noise) and the moments
    * accumulate exactly, Σq² as decimal(38,0); mean and std are then
    * fixed-shape expressions over exact integers, and the zero test
    * is an exact float compare both engines share. Shape: one
    * posexplode into a (dim)-keyed aggregate — dims-sized output. */
  def dimensionStats(embeddings: DataFrame): DataFrame =
    embeddings.where(col("embedding").isNotNull)
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select((col("pos") + 1).cast("long").as("dim"),
        col("v").cast("double").as("vd"))
      .withColumn("q", round(col("vd") * 1000000).cast("bigint"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vals"), sum(col("q")).as("s1"),
        sum(col("q").cast("decimal(38,0)") * col("q")).as("s2"),
        min(col("q")).as("min_q"), max(col("q")).as("max_q"),
        sum(when(col("vd") === 0.0, 1L).otherwise(0L)).as("n_zero"))
      .select(col("dim"), col("n_vals"),
        (col("s1").cast("double") / col("n_vals") / 1000000.0)
          .as("mean_val"),
        (sqrt((col("n_vals").cast("decimal(38,0)") * col("s2") -
          col("s1").cast("decimal(38,0)") * col("s1")).cast("double")) /
          col("n_vals").cast("double") / 1000000.0).as("std_val"),
        (col("min_q").cast("double") / 1000000.0).as("min_val"),
        (col("max_q").cast("double") / 1000000.0).as("max_val"),
        (col("n_zero").cast("double") / col("n_vals")).as("zero_share"))
      .orderBy(col("dim"))

  /** IVF cell-balance QA: the cell-occupancy histogram of the index's
    * [[assignCells]] assignment on decimal-magnitude buckets, plus the
    * global imbalance ratio (max cell / mean cell) on every row — the
    * ANN-index twin of the dedup-index and shingle-index health rows:
    * a fat top bucket or a high imbalance means some probes scan far
    * more than N/k vectors (the p99 latency driver), which is the
    * signal to retrain or split centroids. The corpus collapses in
    * the one assignment aggregate; everything after is cell-grain. */
  /** Per-query IVF probe-cost report: for each query and each probe
    * depth up to `maxProbe`, WHICH cell the probe visits, its size,
    * the cumulative candidates scanned, and that as a share of the
    * indexed corpus — [[ivfBalance]] says the index is skewed in
    * aggregate; this says what each QUERY actually pays, which is the
    * p99 latency driver a serving team tunes nprobe against (a query
    * whose rank-1 cell holds 10% of the corpus is the incident; the
    * histogram never shows who hit it). All counts are exact integers
    * off the one assignment aggregate; the only division is the final
    * share. Corpus collapses in the assignment; everything after is
    * (queries × maxProbe)-sized. */
  def probeCost(embeddings: DataFrame, centroids: DataFrame,
                queryFilter: Column, maxProbe: Int = 2): DataFrame = {
    val assigned = assignCells(embeddings, centroids)
    val cells = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("cell_size"))
    val total = assigned.agg(count(lit(1)).as("n_corpus"))
    val c = withNorm(centroids).where(col("nrm") =!= 0.0).select(
      col("vec_id").as("centroid_id"), col("embedding").as("ce"),
      col("nrm").as("cn"))
    // ranked probe cells per query: the exact qcells struct-sort of
    // [[ivfTopK]], keeping the rank instead of discarding it
    val qc = withNorm(embeddings.where(queryFilter))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
      .crossJoin(broadcast(c))
      .withColumn("ccos", cosine(col("qe"), col("ce"), col("qn"), col("cn")))
      .where(col("ccos").isNotNull)
      .groupBy(col("query_id"))
      .agg(slice(sort_array(collect_list(struct(
        negate(col("ccos")).as("nc"), col("centroid_id").as("cid")))),
        1, maxProbe).as("cells"))
      .select(col("query_id"), posexplode(col("cells")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("nprobe"),
        col("col.cid").as("centroid_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("nprobe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cells is index-sized (√n under centroidStrideFor) — broadcast
    // it so the (queries × nprobe)-sized probe frame never shuffles
    qc.join(broadcast(cells), "centroid_id")
      .withColumn("scanned", sum(col("cell_size")).over(w))
      .crossJoin(broadcast(total))
      .select(col("query_id"), col("nprobe"), col("centroid_id"),
        col("cell_size"), col("scanned"),
        (col("scanned").cast("double") / col("n_corpus").cast("double"))
          .as("corpus_share"))
      .orderBy(col("query_id"), col("nprobe"))
  }

  def ivfBalance(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val cells = assignCells(embeddings, centroids)
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("n_vecs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = cells.agg(count(lit(1)).as("n_cells_total"),
      sum(col("n_vecs")).as("n_total"), max(col("n_vecs")).as("max_total"))
    cells
      .groupBy(length(col("n_vecs").cast("string")).cast("long")
        .as("size_digits"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n_vecs")).as("n_vectors"),
        min(col("n_vecs")).as("min_cell"), max(col("n_vecs")).as("max_cell"))
      .crossJoin(broadcast(g))
      .select(col("size_digits"), col("n_cells"), col("n_vectors"),
        col("min_cell"), col("max_cell"),
        (col("max_total").cast("double") * col("n_cells_total")
          .cast("double") / col("n_total").cast("double"))
          .as("imbalance"))
      .orderBy(col("size_digits"))
  }

  /** Leave-one-out kNN label accuracy over the embedding column: each
    * query vector's label predicted by majority vote of its k exact
    * nearest neighbors (self excluded), reported per true label — the
    * one-number-per-class answer to "do these embeddings actually
    * encode the label", which [[labelSeparation]]'s centroid
    * distances only proxy (centroids can separate while boundaries
    * interleave). Vote ties break to the smaller label; the neighbor
    * lists carry [[bruteForceTopK]]'s exact tie order, so every count
    * is deterministic. The brute leg is linear (fixed queries ×
    * corpus, broadcast queries); everything after is
    * (queries × k)-sized. */
  def knnAccuracy(embeddings: DataFrame, queryFilter: Column,
                  k: Int): DataFrame = {
    val labels = embeddings.select(col("vec_id"), col("label"))
    val nn = bruteForceTopK(embeddings, embeddings.where(queryFilter), k)
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), "neighbor_id")
    nn.groupBy(col("query_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("query_id"))
      .agg(max_by(col("n_label"),
        struct(col("votes"), negate(col("n_label")))).as("pred"))
      .join(labels.select(col("vec_id").as("query_id"), col("label")),
        "query_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("label"), col("n_queries"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_queries"))
          .as("accuracy"))
      .orderBy(col("label"))
  }

  /** Deterministic ±1 (Rademacher) hyperplanes for [[srpNearDup]],
    * seeded so the Spark pipeline and the DuckDB oracle embed the SAME
    * constants — and exactly representable, so the per-plane
    * projection is bit-identical in any engine with a sequential
    * double fold (unlike Gaussian float literals, which need careful
    * decimal round-tripping). */
  def srpPlanes(planes: Int, dim: Int): IndexedSeq[Array[Float]] =
    graft.functions.SrpBandSigs.flatPlanes(planes, dim)
      .grouped(dim).toIndexedSeq

  /** Corpus-sized SRP parameters: the planes-per-band count such that a
    * band's expected bucket occupancy N / 2^(planes/bands) lands at or
    * below `targetBucket` — the knob that keeps ordinary buckets far
    * from the [[graft.operators.NearDup.DefaultBucketCap]] prefix cap
    * (a cap that binds on ordinary buckets silently skews recall
    * toward low vec_ids; a cap that only ever binds on degenerate
    * pile-ups is the intended defense). Returns (planes, bands).
    * Floors at 2 planes/band (1 bucket bit is no LSH at all); more
    * planes per band sharpen precision but cost recall, so the derived
    * value is the smallest that respects `targetBucket`. */
  def srpParamsFor(corpusCount: Long, bands: Int = 4,
                   targetBucket: Int = 64): (Int, Int) = {
    require(corpusCount > 0 && bands > 0 && targetBucket > 0)
    // integer power-of-two ladder, NOT float log2: the oracle replays
    // this derivation in SQL, and float log at an exact power-of-two
    // boundary can round to either side of the integer depending on
    // the engine's libm — the ladder cannot
    var perBand = 2
    while (corpusCount > targetBucket.toLong * (1L << perBand) && perBand < 60)
      perBand += 1
    (bands * perBand, bands)
  }

  /** Embedding near-dup at scale via sign-random-projection LSH
    * (Charikar, STOC'02 — public algorithm): each vector's `planes`
    * projection signs form a bit signature; vectors are bucketed by
    * `bands` signature slices and only same-bucket candidates get an
    * exact cosine verification. The quadratic [[cosineNearDup]] is the
    * small-scale oracle baseline; this is its linear-ish scale path —
    * candidate recall is the LSH collision probability
    * (1-θ/π per plane, banded), every emitted pair is exact.
    * Buckets carry a sorted capped id prefix ([[graft.operators
    * .NearDup.minhashDedup]]'s degenerate-bucket defense — a
    * zero-vector pile-up would otherwise emit O(m²) pairs from one
    * task). SIZE `planes`/`bands` TO THE CORPUS: a band has only
    * 2^(planes/bands) buckets, so expected bucket size is
    * N / 2^(planes/bands) — once that approaches `bucketCap` the
    * prefix cap binds on ORDINARY buckets and recall silently skews
    * toward low vec_ids (the defaults are sized for ≤ ~16k vectors;
    * at 1M use e.g. planes=48, bands=4). Pass `corpusCount` to have
    * the engine derive (planes, bands) itself via [[srpParamsFor]] —
    * the derived choice is logged. With EXPLICIT parameters the engine
    * cannot estimate occupancy without an action, so the guard is
    * observational instead: every action over this plan reports
    * `graft_srp_bucketcap.truncated_buckets`, the number of buckets
    * that actually overflowed the cap — nonzero means the
    * recall-skew regime is live and planes must be raised. The cap is
    * also replayed by the q_embed_lsh oracle, so a binding cap is
    * gate-visible, not a correctness drift.
    *
    * Zero-norm vectors are excluded before bucketing (mirrored by the
    * oracle's `nrm <> 0`): an all-zero vector signs every plane the
    * same way, so degenerate vectors would pile into ONE bucket per
    * band — crowding real candidates out of the capped prefix — and
    * their verify cosine is 0/0, which this engine nulls out while
    * IEEE engines produce NaN (and NaN-vs-threshold ordering is
    * engine-specific). Same treatment as [[assignCells]].
    * Output matches cosineNearDup's shape: (v1, v2, cos). */
  def srpNearDup(embeddings: DataFrame, threshold: Double,
                 planes: Int = 16, bands: Int = 4, dim: Int = 64,
                 bucketCap: Int = NearDup.DefaultBucketCap,
                 corpusCount: Option[Long] = None): DataFrame = {
    val (nPlanes, nBands) = corpusCount match {
      case Some(n) =>
        val derived = srpParamsFor(n, bands)
        log.info(s"srpNearDup: corpusCount=$n → planes=${derived._1} " +
          s"bands=${derived._2} (expected ordinary bucket ≈ " +
          s"${n / (1L << (derived._1 / derived._2))})")
        derived
      case None => (planes, bands)
    }
    corpusCount.foreach { n =>
      val expected = n.toDouble / (1L << (nPlanes / nBands))
      if (expected > bucketCap)
        log.warn(s"srpNearDup: expected bucket occupancy $expected exceeds " +
          s"bucketCap=$bucketCap — ordinary buckets will be truncated and " +
          "recall will skew toward low vec_ids; raise planes or targetBucket")
    }
    val rows = nPlanes / nBands
    // one pass: ALL band signatures from one native expression
    // (graft_srp_sigs). The per-plane graft_dot column formulation
    // this replaces hit the whole-stage-codegen JIT cliff at derived
    // plane counts — the 48-plane sign pass measured 29.8 s codegen'd
    // vs 0.4 s interpreted at the 100× probe (the consume method
    // outgrew HotSpot's 8k-bytecode JIT limit) — see the expression's
    // scaladoc. Persisted because band bucketing AND both verify
    // sides read it.
    val withBits = withNorm(embeddings)
      .where(col("nrm") =!= 0.0)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        call_function("graft_srp_sigs", col("embedding"),
          lit(nPlanes), lit(rows), lit(dim)).as("sigs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = withBits
      .select(col("vec_id"), posexplode(col("sigs")).as(Seq("band", "sig")))
      .groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("n_bucket"),
        slice(sort_array(collect_list(col("vec_id"))), 1, bucketCap).as("ids"))
      // observed metric: the cap BINDING is a visible event on every
      // action over this plan — truncated_buckets counts ordinary
      // buckets that actually overflowed (the recall-skew regime the
      // scaladoc warns about), which no driver-side estimate can see
      // when the caller passed explicit planes/bands and no corpus
      // count. Absent metric = no row reached the observe = no bucket
      // truncated.
      .observe("graft_srp_bucketcap", sum(
        when(col("n_bucket") > bucketCap, 1L).otherwise(0L))
        .as("truncated_buckets"))
      .drop("n_bucket")
      .where(size(col("ids")) > 1)
      .select(explode(NearDup.pairsFromSortedIds).as("p"))
      .select(col("p.a").as("v1"), col("p.b").as("v2"))
      .distinct()
    val side = withBits.select(col("vec_id"), col("embedding"), col("nrm"))
    cand
      .join(side.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("nrm").as("n1")), "v1")
      .join(side.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("nrm").as("n2")), "v2")
      .withColumn("cos", cosine(col("e1"), col("e2"), col("n1"), col("n2")))
      .where(col("cos") >= threshold)
      .select(col("v1"), col("v2"), round(col("cos"), 6).as("cos"))
      .orderBy(col("v1"), col("v2"))
  }

  /** SRP-LSH bucket-occupancy health report — the [[graft.operators
    * .NearDup.indexStats]] discipline for the embedding near-dup
    * family: the histogram of STORED (cap-clamped) bucket sizes under
    * the CORPUS-DERIVED [[srpParamsFor]] parameters, pooled across
    * bands. A mass at `bucket_size = bucketCap` means the prefix cap
    * binds on ordinary buckets (the recall-skew-toward-low-vec_ids
    * regime [[srpNearDup]]'s scaladoc warns about — raise
    * `targetBucket` or bands); a healthy corpus shows a long tail of
    * 1s and single-digit buckets. This is the gate that PROVES the
    * derived plane count right at a given scale instead of assuming
    * it: the expected-occupancy arithmetic in [[srpParamsFor]] is a
    * uniform-hash model, and only the observed histogram says whether
    * the real corpus (correlated embeddings, sign skew) respects it.
    *
    * Scale shape: one corpus pass computing the projection signs
    * (plane literals broadcast inside the expression tree), one
    * (band, sig) count aggregate — map-side combined, no id lists
    * collected — and one histogram aggregate over the ≤ bands·2^
    * (planes/bands)-row bucket frame. Strictly cheaper than the
    * near-dup query it gates. Output: (bucket_size, n_buckets)
    * ordered by size. */
  def srpBucketStats(embeddings: DataFrame, corpusCount: Long,
                     bands: Int = 4, dim: Int = 64,
                     bucketCap: Int = NearDup.DefaultBucketCap): DataFrame = {
    val (nPlanes, nBands) = srpParamsFor(corpusCount, bands)
    val rows = nPlanes / nBands
    withNorm(embeddings)
      .where(col("nrm") =!= 0.0)
      .select(posexplode(call_function("graft_srp_sigs", col("embedding"),
        lit(nPlanes), lit(rows), lit(dim))).as(Seq("band", "sig")))
      .groupBy(col("band"), col("sig"))
      .agg(least(count(lit(1)), lit(bucketCap.toLong)).as("bucket_size"))
      .groupBy(col("bucket_size"))
      .agg(count(lit(1)).as("n_buckets"))
      .orderBy(col("bucket_size"))
  }

  /** Product-quantization ADC top-k (Jégou et al., PAMI'11 — public
    * algorithm): split the `dim`-dim space into `m` subspaces, encode
    * every corpus vector as its nearest codebook entry per subspace
    * (min L2², centroid_id tiebreak), and answer queries by
    * asymmetric distance computation — the query's per-(centroid,
    * subspace) distance table is summed over each vector's m codes.
    *
    * Scale shape: encoding is ONE corpus pass (broadcast codebook,
    * m min_by aggregates collapsed map-side — the same shape as
    * [[assignCells]]); a vector is then m small ints, so the
    * "distance computation" over the whole corpus touches no floats
    * except the broadcast m × |codebook| query table. That memory
    * footprint — codes instead of vectors — is the reason PQ exists:
    * at 100 TB the corpus scan reads 4 ints/vector instead of 64
    * floats. Everything is sequential-fold arithmetic, so the DuckDB
    * oracle replays it exactly. L2² is expanded as
    * dot(a,a) + dot(b,b) − 2·dot(a,b) to reuse the codegen'd
    * sequential-fold [[dot]] (identical expression tree on both
    * engine sides). */
  def pqTopK(embeddings: DataFrame, codebook: DataFrame, queryFilter: Column,
             k: Int, m: Int = 4, dim: Int = 64): DataFrame =
    nearestByApproxDist(
      pqApproxDistances(embeddings, codebook, queryFilter, m, dim), k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("approx_dist"), 6).as("approx_dist"))
      .orderBy(col("query_id"), col("rank"))

  /** Per-query k-nearest cut of a (query_id, vec_id, approx_dist)
    * frame — the graft_topk τ-prune form of `row_number() OVER
    * (PARTITION BY query_id ORDER BY approx_dist, vec_id) <= k`. The
    * ADC frame is corpus × queries grain, so the bare window sorts a
    * CORPUS-sized partition per query (the plan that measured 11.9×
    * at the 100× probe); instead the bounded-heap aggregate finds
    * each query's k-th distance τ (O(k) state, map-side combined —
    * score = −dist so the heap's "top" is nearest, same
    * (dist, vec_id) tie order as the window), the broadcast τ prunes
    * the frame to the ≤τ survivors (≈k + distance-ties per query),
    * and only those pay the exact row_number — bit-identical to the
    * naive window by construction (everything it keeps has
    * dist ≤ τ), which is why the unchanged window-replay oracles
    * still hash-match. */
  private def nearestByApproxDist(approx: DataFrame, k: Int): DataFrame = {
    val a = graft.Caches.hold(approx)
    val thr = a.groupBy(col("query_id"))
      .agg(expr(s"graft_topk(-approx_dist, vec_id, $k)").as("tk"))
      .select(col("query_id"),
        element_at(col("tk"), least(lit(k), size(col("tk"))))
          .getField("score").as("neg_tau"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(asc("approx_dist"), asc("vec_id"))
    a.join(broadcast(thr), "query_id")
      .where(-col("approx_dist") >= col("neg_tau"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("approx_dist"),
        col("rank"))
  }

  /** The m per-subspace dot products in one native pass
    * ([[graft.functions.PqSubDots]]) — replaces the slice-and-dot
    * column formulation that allocated 2m sliced arrays per PAIR row
    * of the n·√n encode frame and generated m-scaled consume methods
    * (the [[graft.functions.SrpBandSigs]] JIT-cliff class). Element
    * j is bit-identical to dot(slice(a, j·subLen+1, subLen),
    * slice(b, …)), so the oracles replay unchanged. */
  private def subDots(a: Column, b: Column, m: Int, subLen: Int): Column =
    call_function("graft_pq_subdots", a, b, lit(m), lit(subLen))

  /** Per-subspace L2² off hoisted self-dot arrays: (selfA_j +
    * selfB_j) − 2·cross_j — the exact expression tree of the expanded
    * dot(a,a) + dot(b,b) − 2·dot(a,b) it replaces, with the two
    * self-dot legs computed ONCE per corpus/codebook row instead of
    * on every pair. */
  private def pqL2At(selfA: Column, selfB: Column, cross: Column,
                     j: Int): Column =
    element_at(selfA, j + 1) + element_at(selfB, j + 1) -
      lit(2.0) * element_at(cross, j + 1)

  /** PQ encoding: every vector of `vecs` (plus any rider columns in
    * `keep`) as its m per-subspace nearest codebook entries — one
    * pass, broadcast codebook, m min_by argmins collapsed map-side.
    * Self-dots are hoisted out of the pair frame: dot(a,a) is
    * constant per corpus row and dot(b,b) per codebook row, so the
    * pair-grain work is ONE fused m-subspace cross-dot per row. */
  private def pqCodes(vecs: DataFrame, cb: DataFrame, keep: Seq[String],
                      m: Int, subLen: Int): DataFrame = {
    val keyCols = ("vec_id" +: keep).map(col)
    // ONE native row-local pass over a plan-time codebook
    // ([[graft.functions.PqCodebookCodes]] — the CellArgmax pattern):
    // the broadcast cross join this replaces fanned every vector to
    // |codebook| rows and argmin'd them back under a sort-aggregate,
    // and codegen's lazy column evaluation re-computed any expensive
    // rider column (the IVF cell) once per PAIR on that fan-out. The
    // codebook rows are the same √n-sized frame the broadcast shipped.
    val cbRows = cb.select(col("centroid_id"), col("ce")).collect()
    if (cbRows.isEmpty) {
      // empty codebook: the old fan-out produced no pair rows and the
      // aggregate an empty frame — keep the output schema
      vecs.where(lit(false)).select(keyCols ++ (0 until m).map(j =>
        lit(null).cast("bigint").as(s"c$j")): _*)
    } else {
      import org.apache.spark.sql.GraftExpressionBridge
      val codes = GraftExpressionBridge.column(graft.functions.PqCodebookCodes(
        GraftExpressionBridge.expression(col("embedding")),
        cbRows.map(_.getLong(0)),
        cbRows.map(_.getSeq[Float](1).toArray), m, subLen))
      vecs.withColumn("graft_pq_cs", codes)
        .select(keyCols ++ (0 until m).map(j =>
          element_at(col("graft_pq_cs"), j + 1).as(s"c$j")): _*)
    }
  }

  /** Query-side ADC distance tables (tiny: queries × codebook, one
    * qd_j per subspace) — broadcast into the code lookups. */
  private def pqDistTables(q: DataFrame, cb: DataFrame,
                           m: Int, subLen: Int): DataFrame = {
    val qq = q.withColumn("qself", subDots(col("qe"), col("qe"), m, subLen))
    val cc = cb.withColumn("cself", subDots(col("ce"), col("ce"), m, subLen))
    qq.crossJoin(broadcast(cc))
      .withColumn("xd", subDots(col("qe"), col("ce"), m, subLen))
      .select(Seq(col("query_id"), col("centroid_id")) ++
        (0 until m).map(j =>
          pqL2At(col("qself"), col("cself"), col("xd"), j).as(s"qd$j")): _*)
  }

  /** m broadcast dtab lookups of a codes frame (any grain that carries
    * query_id + c0..c(m−1)) → summed approx_dist, self-pairs out. */
  private def pqAdcFold(codesWithQuery: DataFrame, dtab: DataFrame,
                        m: Int): DataFrame = {
    var adc = codesWithQuery
    (0 until m).foreach { j =>
      val dj = dtab.select(
        col("query_id"), col("centroid_id").as(s"c$j"), col(s"qd$j"))
      adc = adc.join(broadcast(dj), Seq("query_id", s"c$j"))
    }
    adc
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("approx_dist", (0 until m).map(j => col(s"qd$j")).reduce(_ + _))
      .select(col("query_id"), col("vec_id"), col("approx_dist"))
  }

  /** The shared PQ-ADC stage of [[pqTopK]] and [[pqTopKRerank]]:
    * (query_id, vec_id, approx_dist) for every (query, corpus vector)
    * pair, self-pairs excluded. */
  private def pqApproxDistances(embeddings: DataFrame, codebook: DataFrame,
                                queryFilter: Column, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subLen = dim / m
    val cb = codebook.select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))
    val codes = pqCodes(embeddings, cb, Nil, m, subLen)
    val q = embeddings.where(queryFilter)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val dtab = pqDistTables(q, cb, m, subLen)
    // flat ADC: every query folds every corpus vector's codes — the
    // first lookup (c0) carries the query fan-out
    var adc = codes
    (0 until m).foreach { j =>
      val dj = dtab.select(
        col("query_id"), col("centroid_id").as(s"c$j"), col(s"qd$j"))
      adc = adc.join(broadcast(dj),
        if (j == 0) Seq(s"c$j") else Seq("query_id", s"c$j"))
    }
    adc
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("approx_dist", (0 until m).map(j => col(s"qd$j")).reduce(_ + _))
      .select(col("query_id"), col("vec_id"), col("approx_dist"))
  }

  /** IVF-PQ composed top-k (the standard IVFADC pairing, Jégou et al.,
    * PAMI'11 §V): corpus vectors are cell-assigned against the trained
    * IVF centroids AND PQ-encoded against the codebook; a query ranks
    * only the codes of its `nprobe` nearest cells. This is the scale
    * path flat [[pqTopK]] lacks: the flat ADC fold touches EVERY
    * corpus code for every query — corpus-linear per query by design,
    * the shape that measured 13.7× at the 100× probe even after the
    * τ-prune fixed its window — while here the per-query work is
    * nprobe/|cells| of the corpus, and with √n cells the scan per
    * query is k·√n-ish instead of n.
    *
    * Shape: one cell-assignment pass (broadcast centroids, map-side
    * argmax) feeding one PQ encode pass ([[ivfPqCodes]] — at serve
    * time both are a published table read instead,
    * [[ivfPqTopKWith]]), then the candidate cut is a BROADCAST join
    * of the tiny (query × nprobe) cell list into the codes frame — the
    * corpus-sized codes never shuffle — followed by the same broadcast
    * dtab lookups and bounded-heap τ-prune top-k as flat PQ.
    * Zero-norm vectors are excluded on both sides (no defined cell —
    * same [[assignCells]] contract as [[ivfTopK]]); everything is
    * sequential-fold arithmetic, so the DuckDB oracle replays it
    * exactly. Output: (query_id, neighbor_id, rank, approx_dist). */
  def ivfPqTopK(embeddings: DataFrame, centroids: DataFrame,
                codebook: DataFrame, queryFilter: Column, k: Int,
                m: Int = 4, dim: Int = 64, nprobe: Int = 1): DataFrame =
    ivfPqTopKWith(embeddings, centroids, codebook,
      ivfPqCodes(embeddings, centroids, codebook, m, dim),
      queryFilter, k, m, dim, nprobe)

  /** The corpus-side IVF-PQ index: every vector's IVF cell AND its m
    * PQ codes in one frame (vec_id, cell, c0..c{m−1}) — the artifact
    * a deployment trains ONCE and publishes next to the centroids and
    * codebook ([[graft.operators.AnnIndex.publishIvfPq]]), so serving
    * ([[ivfPqTopKWith]]) touches no float vectors on the corpus side
    * at all. One assignment pass (broadcast centroids, map-side
    * argmax) + one encode pass over the assigned frame (broadcast
    * codebook) — the exact frames [[ivfPqTopK]] builds inline. */
  def ivfPqCodes(embeddings: DataFrame, centroids: DataFrame,
                 codebook: DataFrame, m: Int = 4, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subLen = dim / m
    val cb = codebook.select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))
    val assigned = assignCells(embeddings, centroids)
    pqCodes(
      assigned.select(col("vec_id"), col("embedding"),
        col("centroid_id").as("cell")),
      cb, Seq("cell"), m, subLen)
  }

  /** IVF-PQ serve stage against a PRECOMPUTED codes frame (published
    * or fresh — [[ivfPqTopK]] delegates here, so a served query is
    * bit-identical to a train-fresh one by construction). The query
    * legs read only the query rows (filter-pushed scans of the live
    * embeddings — queries need their float vectors for the cell probe
    * and the ADC distance tables); the corpus side is the m-int codes
    * frame alone, which never shuffles: the tiny (query, cell) probe
    * list is BROADCAST into it. Zero-norm queries are excluded, the
    * [[assignCells]] contract the codes frame itself was built
    * under. */
  def ivfPqTopKWith(embeddings: DataFrame, centroids: DataFrame,
                    codebook: DataFrame, codes: DataFrame,
                    queryFilter: Column, k: Int,
                    m: Int = 4, dim: Int = 64, nprobe: Int = 1): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subLen = dim / m
    val cb = codebook.select(col("vec_id").as("centroid_id"), col("embedding").as("ce"))
    val c = withNorm(centroids).select(col("vec_id").as("centroid_id"),
      col("embedding").as("ce"), col("nrm").as("cn"))
    // query rows with norms, zero-norm excluded — the same rows the
    // inline path's assigned.where(queryFilter) kept (assignCells
    // keeps exactly the nonzero-norm vectors), read directly off the
    // live embeddings so the filter pushes to the scan
    val qside = withNorm(embeddings).where(col("nrm") =!= 0.0)
      .where(queryFilter)
    // top-nprobe cells per query, row-locally (the ivfTopK idiom)
    val qcells = qside
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
      .crossJoin(broadcast(c))
      .withColumn("ccos", cosine(col("qe"), col("ce"), col("qn"), col("cn")))
      .where(col("ccos").isNotNull)
      .groupBy(col("query_id"))
      .agg(slice(sort_array(collect_list(struct(
        negate(col("ccos")).as("nc"), col("centroid_id").as("cid")))),
        1, nprobe).as("cells"))
      .select(col("query_id"), explode(col("cells.cid")).as("cell"))
    val q = qside
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val dtab = pqDistTables(q, cb, m, subLen)
    // THE pruning join: tiny (query, cell) list broadcast into the
    // codes — only probed cells' codes enter the ADC fold
    val cand = broadcast(qcells).join(codes, "cell")
    nearestByApproxDist(pqAdcFold(cand, dtab, m), k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("approx_dist"), 6).as("approx_dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** PQ-ADC with an exact re-rank stage — standard ADC practice
    * (Jégou et al., PAMI'11 §V): the code-based approximate distances
    * shortlist `k · overfetch` candidates per query, and only that
    * shortlist is re-scored by exact cosine against the raw vectors.
    * At 100 TB the corpus-wide work still touches only the m-int
    * codes; the float vectors are read for ≤ k·overfetch·|queries|
    * rows — a candidate frame small enough to broadcast into the
    * corpus-side join. Zero-norm vectors are excluded from the
    * re-rank on both engine and oracle sides (0/0 cosine — see
    * [[srpNearDup]]). Output: (query_id, neighbor_id, rank, cos). */
  def pqTopKRerank(embeddings: DataFrame, codebook: DataFrame,
                   queryFilter: Column, k: Int, m: Int = 4, dim: Int = 64,
                   overfetch: Int = 4): DataFrame = {
    val shortlist = nearestByApproxDist(
      pqApproxDistances(embeddings, codebook, queryFilter, m, dim),
      k * overfetch)
      .select(col("query_id"), col("vec_id"))
    val e = withNorm(embeddings).where(col("nrm") =!= 0.0)
    val q = e.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), col("nrm").as("qn"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_exact"), asc("vec_id"))
    broadcast(shortlist)
      .join(q, "query_id")
      .join(e, "vec_id")
      .withColumn("cos_exact",
        cosine(col("qe"), col("embedding"), col("qn"), col("nrm")))
      .withColumn("rank", row_number().over(wE))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos_exact"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-label centroid separation: the pairwise distance matrix
    * between class centroids in a fixed micro-integer grid — the
    * "are my labels actually separated in embedding space" QA run
    * before anyone trusts a classifier or per-label mixture built on
    * these vectors, and the drift check when embeddings are
    * re-generated (centroids moving = the space moved).
    *
    * Exactness: each element quantizes to an integer micro-unit
    * (⌊v·10⁶+0.5⌋ — float inputs are exact in double, so the floor is
    * portable), per-(label, dim) SUMS are exact bigint under any
    * shuffle order, and each pair's squared distance folds the
    * per-dim (meanₐ−mean_b)² terms in FIXED dim order via the
    * sorted-array aggregate (the BM25 idiom) — the only doubles are
    * the two mean divisions and the ordered fold. Shape: one
    * (vec_id → dim) explode (dim-linear, the vector family's floor),
    * one (label, dim) aggregate, then labels²·dim grid work. */
  def labelCentroidSeparation(embeddings: DataFrame,
                              expectedDim: Int): DataFrame = {
    val cd = healthyVecs(embeddings, expectedDim)
      .select(col("label"), posexplode(col("embedding")).as(Seq("d0", "v")))
      .groupBy(col("label"), col("d0"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v").cast("double") * 1000000 + 0.5).cast("bigint"))
          .as("s"))
      .withColumn("mean_micro", col("s").cast("double") / col("n"))
    val b = cd.select(col("label").as("label_b"), col("d0").as("d0_b"),
      col("n").as("n_b"), col("mean_micro").as("mean_b"))
    cd.join(b, col("d0") === col("d0_b") && col("label") < col("label_b"))
      .select(col("label").as("label_a"), col("label_b"), col("d0"),
        col("n").as("n_a"), col("n_b"),
        ((col("mean_micro") - col("mean_b")) *
          (col("mean_micro") - col("mean_b"))).as("dd"))
      .groupBy(col("label_a"), col("label_b"), col("n_a"), col("n_b"))
      .agg(aggregate(array_sort(collect_list(struct(col("d0"), col("dd")))),
        lit(0.0), (acc, x) => acc + x.getField("dd")).as("ssd"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        (sqrt(col("ssd")) / lit(1000000.0)).as("centroid_dist"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Embedding outliers: the `k` vectors FARTHEST from their own
    * label's centroid, per label — the mislabeled-or-garbage probe
    * run before any per-label mixture, classifier eval, or
    * [[labelCentroidSeparation]] drift reading (one bad batch of
    * vectors drags its centroid and poisons every downstream
    * distance; this names the rows to look at). The vector's own
    * contribution is inside its centroid — the usual QA convention,
    * biasing distances DOWN, never creating a false outlier.
    *
    * Exactness is the [[labelCentroidSeparation]] grid: elements
    * quantize to integer micro-units, per-(label, dim) centroid sums
    * are exact bigint, and each vector's squared distance folds its
    * per-dim terms in FIXED dim order — rank ties break on vec_id so
    * the top-k cut is total. Shape: one dim-explode (n·dim, the
    * family's floor), the labels×dim centroid frame joins back
    * BROADCAST, one per-vector fold aggregate, bounded top-k per
    * label. */
  def embedOutliers(embeddings: DataFrame, expectedDim: Int,
                    k: Int = 10): DataFrame = {
    val ex = healthyVecs(embeddings, expectedDim)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("d0", "v")))
      .select(col("vec_id"), col("label"), col("d0"),
        floor(col("v").cast("double") * 1000000 + 0.5).cast("bigint")
          .as("vm"))
    val cm = ex.groupBy(col("label"), col("d0"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("s"))
      .withColumn("mean_micro", col("s").cast("double") / col("n"))
      .select(col("label"), col("d0"), col("n"), col("mean_micro"))
    val dd = ex.join(broadcast(cm), Seq("label", "d0"))
      .select(col("label"), col("vec_id"), col("d0"), col("n"),
        ((col("vm").cast("double") - col("mean_micro")) *
          (col("vm").cast("double") - col("mean_micro"))).as("dd"))
    val perVec = dd.groupBy(col("label"), col("vec_id"), col("n"))
      .agg(aggregate(array_sort(collect_list(struct(col("d0"), col("dd")))),
        lit(0.0), (acc, x) => acc + x.getField("dd")).as("ssd"))
    val w = Window.partitionBy(col("label"))
      .orderBy(desc("ssd"), asc("vec_id"))
    perVec.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("label"), col("vec_id"), col("rank"),
        col("n").as("n_label"),
        (sqrt(col("ssd")) / lit(1000000.0)).as("centroid_dist"))
      .orderBy(col("label"), col("rank"))
  }

  /** Simplified (centroid) silhouette per label — the
    * cluster-cohesion gauge the full O(n²) silhouette can't give at
    * corpus scale: per vector, a = distance to its OWN label centroid,
    * b = distance to the NEAREST OTHER centroid, s = (b−a)/max(a,b);
    * reported per label as the separated/misplaced/tied counts
    * (b²≷a² — the nearest-centroid-classifier verdict), the mean of
    * the micro-quantized silhouettes, and the exact min/max. The
    * companion read to [[labelCentroidSeparation]] (which says whether
    * CENTROIDS are apart; this says whether the VECTORS actually sit
    * with their own) and [[knnAccuracy]] (the local-neighborhood
    * verdict; this is the global-geometry one).
    *
    * Exactness: the [[labelCentroidSeparation]] grid end-to-end —
    * micro-integer elements, exact bigint centroid sums, per-(vector,
    * candidate) squared distances folded in FIXED dim order; the
    * b²≷a² verdicts compare those deterministic doubles, each
    * vector's silhouette is one fixed-shape scalar chain (two sqrts,
    * one divide), and the per-label MEAN quantizes each silhouette to
    * an integer micro-unit first so the sum is exact bigint in any
    * order (min/max are order-free as-is). Shape: the candidate frame
    * is n·dim·|labels| rows — |labels|× the vector family's
    * dim-explode floor, the intrinsic nearest-centroid cost — with
    * the labels×dim centroid grid riding a broadcast; folds are
    * dim-sized; everything downstream is label-grain. */
  def silhouette(embeddings: DataFrame, expectedDim: Int): DataFrame = {
    val ex = healthyVecs(embeddings, expectedDim)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("d0", "v")))
      .select(col("vec_id"), col("label"), col("d0"),
        floor(col("v").cast("double") * 1000000 + 0.5).cast("bigint")
          .as("vm"))
    val cm = ex.groupBy(col("label"), col("d0"))
      .agg(sum(col("vm")).as("s"), count(lit(1)).as("n"))
      .select(col("label").as("label_c"), col("d0"),
        (col("s").cast("double") / col("n")).as("mean_micro"))
    val dv = ex.join(broadcast(cm), Seq("d0"))
      .select(col("vec_id"), col("label"), col("label_c"), col("d0"),
        ((col("vm").cast("double") - col("mean_micro")) *
          (col("vm").cast("double") - col("mean_micro"))).as("dd"))
    val pv = dv.groupBy(col("vec_id"), col("label"), col("label_c"))
      .agg(aggregate(array_sort(collect_list(struct(col("d0"), col("dd")))),
        lit(0.0), (acc, x) => acc + x.getField("dd")).as("ssd"))
    val per = pv.groupBy(col("vec_id"), col("label"))
      .agg(min(when(col("label_c") === col("label"), col("ssd"))).as("a2"),
        min(when(col("label_c") =!= col("label"), col("ssd"))).as("b2"))
    val a = sqrt(col("a2"))
    val b = sqrt(col("b2"))
    val sil = when(col("a2") === 0.0 && col("b2") === 0.0, lit(0.0))
      .otherwise((b - a) / greatest(a, b))
    per
      .select(col("label"), col("a2"), col("b2"), sil.as("sil"),
        floor(sil * 1000000 + 0.5).cast("bigint").as("sil_micro"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("b2") > col("a2"), 1L).otherwise(0L))
          .as("n_separated"),
        sum(when(col("b2") < col("a2"), 1L).otherwise(0L))
          .as("n_misplaced"),
        sum(when(col("b2") === col("a2"), 1L).otherwise(0L)).as("n_tied"),
        sum(col("sil_micro")).as("sm"),
        min(col("sil")).as("min_sil"), max(col("sil")).as("max_sil"))
      .select(col("label"), col("n"), col("n_separated"),
        col("n_misplaced"), col("n_tied"),
        (col("n_separated").cast("double") / col("n")).as("sep_share"),
        (col("sm").cast("double") / col("n") / 1000000.0).as("mean_sil"),
        col("min_sil"), col("max_sil"))
      .orderBy(col("label"))
  }
}
