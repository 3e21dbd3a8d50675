package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{BloomAgg, BloomContains, DeflateLen, DotProduct, HammingPairs, MatchMask, MinHashSigs, MisraGriesAgg, NfcNormalize, Pairs, PqSubDots, QualityCounts, RollingHash, RollingHashes, SeedHashes, SetJaccard, Shingles, SimHash40, SrpBandSigs, Tokenize, TopKAgg}

/** Standard session config for the graft engine. One place to keep the
  * settings that matter at scale (AQE, shuffle partitions sized to the
  * environment, UTC semantics) and the parquet-nanos compatibility
  * switch the testdata needs.
  *
  * Cluster sizing (the knobs that change when this session moves from
  * local[32] to a 1000-executor cluster; values here are the local
  * ones):
  *  - `spark.sql.shuffle.partitions`: 2–3× total executor cores. AQE
  *    coalesces small post-shuffle partitions downward at runtime, so
  *    err high — too few partitions at 100 TB means >2 GB shuffle
  *    blocks and executor OOM, which AQE cannot fix upward before
  *    Spark 4's full skew handling kicks in only for joins/aggs.
  *  - `spark.sql.files.maxPartitionBytes`: the 128 MB Spark default
  *    (see the inline note — a round-9 global 16 MB floor taxed every
  *    light scan 8% net; CPU-dense single-pass operators carry their
  *    own per-operator parallelism floor via
  *    [[Tables.documentsFloored]] instead). On a cluster RAISE
  *    (256–512 MB) for narrow projections over many small row
  *    groups, where task-scheduling overhead dominates.
  *  - `spark.sql.autoBroadcastJoinThreshold`: the engine broadcast()s
  *    its dimension/vocab/centroid/eval-set sides EXPLICITLY, so
  *    correctness never depends on this threshold or on stats.
  *  - AQE stays on everywhere: runtime partition coalescing plus
  *    skew-join splitting (demonstrated in PlanAuditSpec) are the
  *    defense for the skew this engine does not pre-salt; the planted
  *    hot-key path (Skew.saltedSum) covers aggregation skew, which
  *    AQE does not split.
  */
object GraftSession {
  private type Exprs = Seq[org.apache.spark.sql.catalyst.expressions.Expression]

  /** Arity gate for the SQL-callable builders: a wrong-arity call
    * (`graft_minhash(sigs)`) must fail with a named analysis-time
    * error, not an IndexOutOfBoundsException from `exprs(2)`. */
  private def arity(name: String, n: Int, exprs: Exprs): Exprs = {
    require(exprs.length == n,
      s"$name expects $n argument(s), got ${exprs.length}")
    exprs
  }

  /** Int-literal extractor for the SQL-callable builders' shape
    * parameters. Accepts any integral literal (SQL `3` parses as int
    * but `3L`/tinyint casts arrive as other integral types) after
    * constant-folding foldable expressions, so `graft_hamming_pairs(a,
    * 1 + 2)` works; anything non-foldable or non-integral fails with
    * a named analysis-time error instead of a raw match crash. */
  private def intLitArg(fn: String, what: String,
                        e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val folded =
      if (e.foldable && e.deterministic) Literal.create(e.eval(), e.dataType)
      else e
    folded match {
      case Literal(v: Byte, ByteType) => v.toInt
      case Literal(v: Short, ShortType) => v.toInt
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) =>
        require(v >= Int.MinValue && v <= Int.MaxValue,
          s"$fn $what overflows int: $v")
        v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn $what must be an integral literal, got $other")
    }
  }

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions { ext =>
        ext.injectFunction((
          FunctionIdentifier("graft_dot"),
          new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
          (exprs: Exprs) => { val e = arity("graft_dot", 2, exprs)
            DotProduct(e.head, e(1)) }))
        ext.injectFunction((
          FunctionIdentifier("graft_rolling_hash"),
          new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
          (exprs: Exprs) => { val e = arity("graft_rolling_hash", 1, exprs)
            RollingHash(e.head) }))
        ext.injectFunction((
          FunctionIdentifier("graft_minhash"),
          new ExpressionInfo(classOf[MinHashSigs].getName, "graft_minhash"),
          (exprs: Exprs) => { val e = arity("graft_minhash", 3, exprs)
            MinHashSigs(e(0), e(1), e(2)) }))
        ext.injectFunction((
          FunctionIdentifier("graft_simhash"),
          new ExpressionInfo(classOf[SimHash40].getName, "graft_simhash"),
          (exprs: Exprs) => { val e = arity("graft_simhash", 1, exprs)
            SimHash40(e.head) }))
        ext.injectFunction((
          FunctionIdentifier("graft_bloom_agg"),
          new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
          (exprs: Exprs) => { val e = arity("graft_bloom_agg", 3, exprs)
            BloomAgg(e(0), e(1), e(2)).toAggregateExpression() }))
        ext.injectFunction((
          FunctionIdentifier("graft_topk"),
          new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
          (exprs: Exprs) => { val e = arity("graft_topk", 3, exprs)
            TopKAgg(e(0), e(1), e(2)).toAggregateExpression() }))
        ext.injectFunction((
          FunctionIdentifier("graft_nfc"),
          new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
          (exprs: Exprs) => { val e = arity("graft_nfc", 1, exprs)
            NfcNormalize(e.head) }))
        ext.injectFunction((
          FunctionIdentifier("graft_heavy_agg"),
          new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_heavy_agg"),
          (exprs: Exprs) => { val e = arity("graft_heavy_agg", 2, exprs)
            MisraGriesAgg(e(0), e(1)).toAggregateExpression() }))
        ext.injectFunction((
          FunctionIdentifier("graft_match_mask"),
          new ExpressionInfo(classOf[MatchMask].getName, "graft_match_mask"),
          (exprs: Exprs) => {
            require(exprs.length >= 2,
              "graft_match_mask expects (text, pattern, ...)")
            val pats = exprs.tail.map {
              case org.apache.spark.sql.catalyst.expressions.Literal(
                s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
              case other => throw new IllegalArgumentException(
                s"graft_match_mask patterns must be string literals, got $other")
            }
            MatchMask(exprs.head, pats)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_seed_hashes"),
          new ExpressionInfo(classOf[SeedHashes].getName, "graft_seed_hashes"),
          (exprs: Exprs) => { val e = arity("graft_seed_hashes", 2, exprs)
            SeedHashes(e.head, intLitArg("graft_seed_hashes", "seedLen", e(1))) }))
        ext.injectFunction((
          FunctionIdentifier("graft_deflate_len"),
          new ExpressionInfo(classOf[DeflateLen].getName, "graft_deflate_len"),
          (exprs: Exprs) => { val e = arity("graft_deflate_len", 1, exprs)
            DeflateLen(e.head) }))
        ext.injectFunction((
          FunctionIdentifier("graft_tokens"),
          new ExpressionInfo(classOf[Tokenize].getName, "graft_tokens"),
          (exprs: Exprs) => { val e = arity("graft_tokens", 1, exprs)
            Tokenize(e.head) }))
        ext.injectFunction((
          FunctionIdentifier("graft_quality_counts"),
          new ExpressionInfo(classOf[QualityCounts].getName,
            "graft_quality_counts"),
          (exprs: Exprs) => {
            require(exprs.length >= 2,
              "graft_quality_counts expects (text, stopword...)")
            val words = exprs.tail.map {
              case org.apache.spark.sql.catalyst.expressions.Literal(
                s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
              case other => throw new IllegalArgumentException(
                s"graft_quality_counts stopwords must be string literals, got $other")
            }
            QualityCounts(exprs.head, words)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_bloom_contains"),
          new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
          (exprs: Exprs) => { val e = arity("graft_bloom_contains", 2, exprs)
            BloomContains(e(0), e(1)) }))
        ext.injectFunction((
          FunctionIdentifier("graft_shingles"),
          new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
          (exprs: Exprs) => { val e = arity("graft_shingles", 2, exprs)
            Shingles(e.head, intLitArg("graft_shingles", "n", e(1))) }))
        ext.injectFunction((
          FunctionIdentifier("graft_rolling_hashes"),
          new ExpressionInfo(classOf[RollingHashes].getName,
            "graft_rolling_hashes"),
          (exprs: Exprs) => { val e = arity("graft_rolling_hashes", 1, exprs)
            RollingHashes(e.head) }))
        ext.injectFunction((
          FunctionIdentifier("graft_pairs"),
          new ExpressionInfo(classOf[Pairs].getName, "graft_pairs"),
          (exprs: Exprs) => { val e = arity("graft_pairs", 1, exprs)
            Pairs(e.head) }))
        ext.injectFunction((
          FunctionIdentifier("graft_hamming_pairs"),
          new ExpressionInfo(classOf[HammingPairs].getName,
            "graft_hamming_pairs"),
          (exprs: Exprs) => { val e = arity("graft_hamming_pairs", 2, exprs)
            HammingPairs(e.head,
              intLitArg("graft_hamming_pairs", "maxHamming", e(1))) }))
        ext.injectFunction((
          FunctionIdentifier("graft_jaccard"),
          new ExpressionInfo(classOf[SetJaccard].getName, "graft_jaccard"),
          (exprs: Exprs) => { val e = arity("graft_jaccard", 2, exprs)
            SetJaccard(e.head, e(1)) }))
        ext.injectFunction((
          FunctionIdentifier("graft_pq_subdots"),
          new ExpressionInfo(classOf[PqSubDots].getName, "graft_pq_subdots"),
          (exprs: Exprs) => { val e = arity("graft_pq_subdots", 4, exprs)
            PqSubDots(e.head, e(1),
              intLitArg("graft_pq_subdots", "m", e(2)),
              intLitArg("graft_pq_subdots", "subLen", e(3))) }))
        ext.injectFunction((
          FunctionIdentifier("graft_srp_sigs"),
          new ExpressionInfo(classOf[SrpBandSigs].getName, "graft_srp_sigs"),
          (exprs: Exprs) => { val e = arity("graft_srp_sigs", 4, exprs)
            SrpBandSigs(e.head,
              intLitArg("graft_srp_sigs", "nPlanes", e(1)),
              intLitArg("graft_srp_sigs", "perBand", e(2)),
              intLitArg("graft_srp_sigs", "dim", e(3))) }))
      }
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // Scan granularity: the 128 MB Spark default. Round 9 floored
      // this session-globally to 16 MB after the sf10 probe caught
      // CPU-dense scans serialized on one core — but the root cause
      // was ScaleUp writing ONE unsplittable file (fixed: 64-file
      // facts), and the global floor taxed every light scan instead:
      // the round-10 A/B on the full 299-query sf0.1 bench measured
      // 16 MB = 224.3 s vs 128 MB = 205.7 s (median per-query ratio
      // 0.918), with ZERO text-family regressions at 128 MB because
      // the CPU-dense single-pass operators carry their own
      // parallelism floor (Tables.documentsFloored — applied
      // per-operator, the selective discipline this knob's global
      // floor duplicated badly). On a cluster reading 100 TB this
      // stays at or above the default (256–512 MB for narrow
      // projections); it is a per-deployment setting.
      // SPARK_GRAFT_SCAN_MB overrides for A/B probes.
      .config("spark.sql.files.maxPartitionBytes",
        s"${sys.env.getOrElse("SPARK_GRAFT_SCAN_MB", "128").toInt * 1024 * 1024}")
      // small-file packing: the scale-probe corpora are written as
      // many ~1 MB files; the default 4 MB per-file "open cost" would
      // pack them back into few fat partitions
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reference semantics (PySpark 2.x era): x/0 → NULL instead of
      // ANSI errors. NOTE this does NOT match DuckDB double division
      // (IEEE: x/0 → inf/NaN) — operators guard zero-able
      // denominators with nullif on BOTH sides so the oracles agree
      // regardless of data
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")

  /** local[n] session; n defaults from SPARK_GRAFT_CPUS. */
  def local(defaultCpus: Int = 4): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus.toString).toInt
    val spark = builder(s"local[$cpus]", math.max(cpus, 4)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
