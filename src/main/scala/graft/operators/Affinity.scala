package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Item-affinity analytics over the order log: co-purchase pair
  * counts, item-item cosine similarity (the classic item-based
  * collaborative-filtering neighborhood table), and PageRank over the
  * co-purchase graph (the "importance" centrality a recommender or
  * merchandising report ranks catalog items by).
  *
  * Scale shape, in one sentence each:
  *  - pairs are generated IN-TASK from per-order sorted item sets
  *    (never a self-join of the (order, item) stream — the
  *    [[Temporal.basketPairs]] idiom), so pair work is bounded by
  *    items-per-order², not corpus²;
  *  - similarity joins are all key-grain (pair counts carry both
  *    items' order counts WITH them via structs, so no post-pair
  *    count join exists at all), and the per-item neighborhood cut
  *    uses the bounded-heap `graft_topk` aggregate — shuffle volume
  *    items×k, no sort over hot items' candidate lists;
  *  - PageRank is the standard distributed value iteration: the
  *    STATIC edge frame is hash-partitioned on src once and persisted,
  *    so each iteration moves only the node-sized rank frame to the
  *    edges (plus one edge-grain aggregate to the dst grain), and
  *    lineage is cut per iteration with localCheckpoint (the Lloyd /
  *    BPE loop pattern — without it the plan doubles per round).
  *
  * Determinism (the gate property): similarity scores are
  * `cooc / sqrt(n_a·n_b)` where every input is an exact integer count
  * — each IEEE step (int→double, ×, sqrt, ÷) is correctly rounded, so
  * engine and oracle agree bit-for-bit. PageRank avoids float
  * entirely: ranks are integer MICRO-rank units, the damping step is
  * the exact rational `(rank·17) div 20 div outdeg`, and integer sums
  * are order-independent — a float PageRank would differ in the last
  * ULP per summation order at any scale. Rank overflow bound:
  * total mass ≤ nodes·10⁶, and the ·17 step needs rank·17 < 2⁶³ —
  * safe below ~5·10¹⁴ nodes (documented, unreachable).
  */
object Affinity {

  /** Memoized shared pair frames, keyed by (session, input plan,
    * builder). Running several affinity queries in one session used
    * to build and persist an independent copy of the same pair frame
    * per operator; the memo hands every operator the SAME persisted
    * frame. Entries whose cache was dropped externally (Bench/Runner
    * do scoped per-query release) re-persist on lookup — the plan is
    * identical, only the materialization is redone. [[clearCache]] is
    * the caller-side release for ALL frames this module persists,
    * internal intermediates included. */
  private val memo =
    scala.collection.mutable.Map[(Int, Int, String), DataFrame]()

  /** Internal persisted intermediates (e.g. the triangle orientation
    * frame) that are not returned to the caller — released by
    * [[clearCache]] so a long-lived session can reclaim them. */
  private val held = scala.collection.mutable.ListBuffer[DataFrame]()

  // visible to the Runner's run-scoped shared-artifact exemption
  graft.Caches.registerProvider(() =>
    synchronized((memo.values ++ held).toSeq))

  private def hold(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    held += p
    p
  }

  private def memoized(input: DataFrame, kind: String)
                      (build: => DataFrame): DataFrame = synchronized {
    val key = (System.identityHashCode(input.sparkSession),
      input.queryExecution.analyzed.semanticHash(), kind)
    memo.get(key) match {
      case Some(df) =>
        // external scoped cleanup (Bench, Runner) may have dropped the
        // buffers; re-register so in-query reuse stays cached
        if (df.storageLevel == StorageLevel.NONE)
          df.persist(StorageLevel.MEMORY_AND_DISK)
        df
      case None =>
        // the builder persists (and may eagerly materialize, so its
        // own intermediates can be released immediately)
        val df = build
        memo(key) = df
        df
    }
  }

  /** Release every frame this module has persisted (memoized pair
    * frames and internal intermediates). Safe to call mid-session;
    * subsequent operator calls rebuild what they need. */
  def clearCache(): Unit = synchronized {
    (memo.values ++ held).foreach { df =>
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    memo.clear()
    held.clear()
  }

  /** Distinct (order, item) memberships — an order listing an item on
    * several lines counts once, as a set membership. */
  private def orderParts(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()

  /** Undirected co-purchase pairs with both sides' order counts:
    * (part_a < part_b, n_a, n_b, cooc). Each item's order count is
    * attached BEFORE the per-order set aggregation (one key-grain
    * join), so the exploded pairs carry (n_a, n_b) with them and the
    * pair grain never joins anything afterwards.
    *
    * The RESULT is persisted and MEMOIZED (released via
    * [[clearCache]]): [[itemSimilarity]] immediately unions the frame
    * with its own swap, and without the persist each union branch
    * re-runs the whole distinct→join→sets→explode chain — measured 3×
    * the operator's total cost at sf0.1 — while the memo hands
    * [[triangleStats]]/[[wedgeRecommendations]]/[[itemSimilarity]]
    * the same copy instead of three. The first build materializes
    * eagerly so the internal (order, item) frame can be released at
    * once instead of pinning storage for the session. (The graph
    * operators use the leaner count-free [[coPairs]] instead.) */
  def coPurchasePairs(lineitem: DataFrame): DataFrame =
    memoized(lineitem, "coPurchasePairs") {
      val op = orderParts(lineitem)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cnt = op.groupBy(col("part")).agg(count(lit(1)).as("cnt"))
      val sets = op.join(cnt, "part")
        .groupBy(col("okey"))
        .agg(sort_array(collect_set(struct(col("part"), col("cnt")))).as("ps"))
      // native graft_pairs over the (part, cnt) carrier structs — the
      // interpreted nested-transform fan-out this replaces was the
      // family's dominant CPU (see coPairs)
      val res = sets.where(size(col("ps")) >= 2)
        .select(explode(call_function("graft_pairs", col("ps"))).as("p"))
        .groupBy(col("p.a.part").as("part_a"), col("p.b.part").as("part_b"),
          col("p.a.cnt").as("n_a"), col("p.b.cnt").as("n_b"))
        .agg(count(lit(1)).as("cooc"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      res.count()
      op.unpersist(blocking = false)
      res
    }

  /** Top-`topN` most-similar items per item by co-purchase cosine:
    * cos(a,b) = |orders with both| / sqrt(|orders with a|·|orders
    * with b|). The neighborhood cut is the bounded-heap `graft_topk`
    * (score desc, item-id-asc ties — exactly the oracle's
    * row_number order), and the kept (item, other) keys re-join the
    * persisted scored frame to recover the count columns — a
    * (items×k)-sized probe into the pair grain, cheaper than sorting
    * every hot item's full candidate list under a window. */
  def itemSimilarity(lineitem: DataFrame, topN: Int = 5): DataFrame = {
    val pairs = coPurchasePairs(lineitem)
    val sym = pairs
      .select(col("part_a").as("part"), col("part_b").as("other"),
        col("cooc"), col("n_a"), col("n_b"))
      .unionAll(pairs.select(col("part_b").as("part"),
        col("part_a").as("other"), col("cooc"),
        col("n_b").as("n_a"), col("n_a").as("n_b")))
    // persisted via hold(): the graft_topk cut and the count-recovery
    // join both read it; released by [[clearCache]]
    val scored = hold(sym
      .withColumn("cos_sim", col("cooc").cast("double") /
        sqrt(col("n_a").cast("double") * col("n_b"))))
    val top = scored.groupBy(col("part"))
      .agg(call_function("graft_topk",
        col("cos_sim"), col("other"), lit(topN)).as("top"))
      .select(col("part"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("part"), col("e.id").as("other"),
        (col("pos") + 1).cast("int").as("rk"))
    top.join(scored, Seq("part", "other"))
      .select(col("part"), col("other"), col("cooc"), col("n_a"),
        col("n_b"), col("cos_sim"), col("rk"))
      .orderBy(col("part"), col("rk"))
  }

  /** Exact-integer PageRank over the undirected co-purchase graph
    * (each undirected pair contributes both directed edges), `iters`
    * damped value-iteration rounds, top-`topN` items by final rank.
    *
    * rank₀ = 10⁶ micro-rank per node;
    * rankₖ₊₁(v) = 150 000 + Σ_{u→v} ((rankₖ(u)·17) div 20) div deg(u)
    * — the 0.85-damped update in exact integer arithmetic (truncation
    * replaces float rounding; sums are order-independent, so the
    * result is bit-identical however Spark schedules the shuffle).
    * Every node in the graph has deg ≥ 1 by construction (pairs are
    * symmetric), so no dangling-mass term is needed. */
  /** Distinct undirected co-purchase pairs WITHOUT counts — the graph
    * edge set. Leaner than [[coPurchasePairs]]: collect_set dedups
    * in-aggregate so the distinct pre-pass and the count-attach join
    * both drop out — one shuffle from the raw line stream to
    * per-order sets, one to the distinct pair grain (measured ~40%
    * off [[pageRank]]'s setup at sf0.1). Persisted and memoized
    * ([[graphStats]] and [[pageRank]] share one copy); released via
    * [[clearCache]]. */
  def coPairs(lineitem: DataFrame): DataFrame =
    memoized(lineitem, "coPairs") {
      val sets = lineitem
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
        .groupBy(col("okey"))
        .agg(sort_array(collect_set(col("part"))).as("ps"))
      // native graft_pairs: the interpreted nested-transform fan-out
      // this replaces cost ~22 s CPU to shuffle 7 MB at sf0.1 (the
      // round-13 DevProbe of q_graph_stats) — the dominant CPU of
      // every query on this frame
      sets.where(size(col("ps")) >= 2)
        .select(explode(call_function("graft_pairs", col("ps"))).as("p"))
        .select(col("p.a").as("part_a"), col("p.b").as("part_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Degree distribution + size QA of the co-purchase graph — the
    * preflight for [[pageRank]]/[[itemSimilarity]]: a heavy top
    * bucket means hub items whose neighborhoods dominate pair work
    * (the graph's skew report). Buckets are DECIMAL MAGNITUDE (the
    * digit count of the degree: 1–9, 10–99, …) — an integer-exact,
    * engine-portable log₁₀ that stays non-degenerate from sparse to
    * dense graphs, where a fixed cap collapses every dense graph
    * into one row and floor(log2(double)) is not correctly rounded
    * at the bucket boundaries. node_frac is each bucket's share of
    * all nodes. One edge-grain aggregate to the node grain, one
    * node-grain aggregate to ≤20 digit rows, total as a broadcast
    * 1-row frame. */
  def graphStats(lineitem: DataFrame): DataFrame = {
    val pairs = coPairs(lineitem)
    val edges = pairs.unionAll(
      pairs.select(col("part_b"), col("part_a"))).toDF("src", "dst")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val total = deg.agg(count(lit(1)).as("n_nodes_total"))
    deg.groupBy(length(col("deg").cast("string")).cast("long")
        .as("deg_digits"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("deg_min"), max(col("deg")).as("deg_max"),
        sum(col("deg")).as("sum_deg"))
      .crossJoin(broadcast(total))
      .select(col("deg_digits"), col("n_nodes"), col("deg_min"),
        col("deg_max"), col("sum_deg"),
        (col("n_nodes").cast("double") / col("n_nodes_total"))
          .as("node_frac"))
      .orderBy(col("deg_digits"))
  }

  /** Degree assortativity of the min-support co-purchase graph: the
    * Pearson correlation of endpoint degrees over the directed edge
    * list (both orientations, the standard Newman r) — positive means
    * hubs link to hubs (a rich-club catalog where bestsellers
    * cross-sell each other), negative means hub-and-spoke (bestsellers
    * pull long-tail items). The one-number structure read next to
    * [[graphStats]]' degree histogram: the histogram says how skewed
    * the degrees are, r says how they WIRE.
    *
    * Determinism and scale: the same support-≥`minSupport` edge set as
    * [[triangleStats]] (memoized [[coPurchasePairs]] bounds the pair
    * explosion). The directed edge list of the standard Newman r is
    * never MATERIALIZED: per undirected pair it holds (da,db) AND
    * (db,da), so the moments fold symmetrically off the UNDOUBLED
    * pair frame — m2 = 2·|pairs|, sx = sy = Σ(da+db), sxy = 2·Σda·db,
    * sxx = syy = Σ(da²+db²) — half the join volume of doubling
    * first (the doubled form shuffled 840+673 MB through two ~700
    * s-CPU stages at the 100× probe). Degrees come from one explode
    * of the pair frame. Per-row products are LONG multiplies
    * (deg < 2³¹ so da·db < 2⁶²), cast to decimal(38,0) only for the
    * overflow-safe SUM (n·Σxy needs ~int128 on a dense graph — the
    * moment-sum overflow trap; per-row BigDecimal multiplies were
    * half the probe's CPU); r is assembled from the identical exact
    * integers the doubled form produced, with two double
    * conversions, one sqrt and one division, mirrored exactly in the
    * oracle. Output is one row. */
  def degreeAssortativity(lineitem: DataFrame, minSupport: Int = 2): DataFrame = {
    val pairs = coPurchasePairs(lineitem)
      .where(col("cooc") >= minSupport)
      .select(col("part_a"), col("part_b"))
    val deg = hold(pairs
      .select(explode(array(col("part_a"), col("part_b"))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("deg")))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val half = pairs
      .join(deg.select(col("u").as("part_a"), col("deg").as("da")), "part_a")
      .join(deg.select(col("u").as("part_b"), col("deg").as("db")), "part_b")
      .agg(count(lit(1)).cast("decimal(38,0)").as("m1"),
        sum((col("da") + col("db")).cast("decimal(38,0)")).as("s1"),
        sum((col("da") * col("db")).cast("decimal(38,0)")).as("s12"),
        sum((col("da") * col("da") + col("db") * col("db"))
          .cast("decimal(38,0)")).as("s11"))
    val moments = half.select(
      (col("m1") * 2).cast("decimal(38,0)").as("m2"),
      col("s1").as("sx"), col("s1").as("sy"),
      (col("s12") * 2).cast("decimal(38,0)").as("sxy"),
      col("s11").as("sxx"), col("s11").as("syy"))
    moments.crossJoin(broadcast(nodes))
      .select(col("n_nodes"),
        expr("CAST(m2 AS BIGINT) div 2").as("n_edges"),
        ((col("m2") * col("sxy") - col("sx") * col("sy")).cast("double") /
          nullif(sqrt(
            (col("m2") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("m2") * col("syy") - col("sy") * col("sy")).cast("double")),
            lit(0.0))).as("assortativity"))
  }

  /** Exact triangle census of the MIN-SUPPORT co-purchase graph:
    * node/edge/wedge counts, the triangle count, and global
    * transitivity (3·triangles / wedges) — the one-row "how clustered
    * is this graph" report behind community detection and
    * recommendation-quality work.
    *
    * Two scale controls, both load-bearing:
    *  - `minSupport` keeps only pairs co-purchased in ≥ that many
    *    orders — the production noise floor (a once-seen pair is not
    *    a relationship), and the density control: the support-1
    *    basket graph is near-complete (measured 1.2M edges and 21.9 s
    *    at sf0.1; support-2 is 3.6k edges, sub-second);
    *  - the triangle join runs on the DEGREE-ORDERED orientation
    *    (each edge directed from its lower-(degree, id) endpoint), so
    *    each triangle counts exactly once as u→v, v→w, u→w and every
    *    node's out-degree is O(√m) — candidate paths are O(m^1.5)
    *    total regardless of hub degrees, where the naive edge-pair
    *    join pays Σdeg² on hubs.
    * Orientation changes the plan, never the count: the oracle
    * replays the NAIVE a<b<c formulation over the same min-support
    * graph and must agree exactly. Wedges are Σ C(deg, 2) off the
    * degree frame — no join at all. */
  def triangleStats(lineitem: DataFrame, minSupport: Int = 2): DataFrame = {
    require(minSupport >= 1, "minSupport must be at least 1")
    val pairs = coPurchasePairs(lineitem)
      .where(col("cooc") >= minSupport)
      .select(col("part_a"), col("part_b"))
    val edges = pairs.unionAll(
      pairs.select(col("part_b"), col("part_a"))).toDF("src", "dst")
    val deg = hold(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val withDeg = pairs
      .join(deg.select(col("src").as("part_a"), col("deg").as("da")),
        "part_a")
      .join(deg.select(col("src").as("part_b"), col("deg").as("db")),
        "part_b")
    val oriented = hold(withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("part_a") < col("part_b")),
        struct(col("part_a").as("u"), col("part_b").as("v")))
        .otherwise(struct(col("part_b").as("u"), col("part_a").as("v")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v")))
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.v") === col("e2.u"))
      .join(oriented.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .agg(count(lit(1)).as("n_triangles"))
    // integer div throughout: deg·(deg−1) is even, and a double /2
    // would lose exactness past 2^53 at web-graph degrees
    val sizes = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      expr("sum(deg * (deg - 1) div 2)").as("n_wedges"))
    sizes.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        ((col("n_triangles") * 3).cast("double") /
          nullif(col("n_wedges"), lit(0L))).as("transitivity"))
  }

  /** Corpus-derived wedge-graph support — the same
    * derive-from-the-corpus contract as [[Linkage.blockCharsFor]]: a
    * FIXED minSupport makes the support-filtered edge set compound
    * with corpus density (measured 11.4× operator time at 10× data at
    * the sf1 probe), so the support level is derived from the pair
    * multiplicity histogram instead. `hist` is (cooc, pair count)
    * rows; the result is the smallest support s ≥ `floor` whose
    * edge set |{pairs : cooc ≥ s}| fits `edgeBudget` — equivalently
    * `max(floor, 1 + max{v : ge(v) > edgeBudget})` where ge(v) is the
    * descending-cumulative pair count. ge is non-increasing in v, so
    * this is the unique minimal in-budget support; the oracle replays
    * the identical rule in SQL off the same histogram, making the
    * derived knob part of the gate, not folklore. The wedge stage's
    * work is then bounded by nodes·cap² ≤ 2·edgeBudget·cap² — density
    * moves the support level, never the candidate volume. */
  def wedgeSupportFor(hist: Seq[(Long, Long)], floor: Int = 2,
                      edgeBudget: Long = 100000L): Int = {
    require(floor >= 1, "support floor must be at least 1")
    require(edgeBudget > 0, "edgeBudget must be positive")
    var cum = 0L
    var over = 0L // largest cooc value whose ge-count exceeds budget
    hist.sortBy(-_._1).foreach { case (v, c) =>
      cum += c
      if (cum > edgeBudget && v > over) over = v
    }
    require(over < Int.MaxValue, s"cooc $over out of Int range")
    math.max(floor, over.toInt + 1)
  }

  /** Triadic-closure recommendations over the min-support co-purchase
    * graph: item pairs that are NOT connected but share common
    * neighbors — "bought together with the same things, never yet
    * together" — ranked by common-neighbor count (the link-prediction
    * baseline every recommender starts from).
    *
    * Shape: per-vertex neighbor sets (sorted, capped at `neighborCap`
    * — a hub's candidate fan-out is cap², never deg², the LSH-bucket
    * cap discipline; the cap is REPLAYED by the oracle so a binding
    * cap is a gate event, not drift), in-task wedge-pair explode (the
    * basketPairs idiom), one (u, w)-grain count, and a left-ANTI join
    * against the existing edge set — candidates are wedge-bounded,
    * the anti join is key-grain.
    *
    * The support level is CORPUS-DERIVED via [[wedgeSupportFor]]
    * (floored at `minSupportFloor`, edge set bounded by `edgeBudget`)
    * and emitted as the `min_support` column, so the oracle's
    * replayed derivation is hash-checked with the result. The
    * multiplicity histogram collected to the driver is bounded by the
    * DISTINCT cooc values — O(√Σcooc) rows, a few hundred at any
    * scale — the BPE-merge-table driver-small class. */
  def wedgeRecommendations(lineitem: DataFrame, minSupportFloor: Int = 2,
                           neighborCap: Int = 64,
                           topN: Int = 100,
                           edgeBudget: Long = 100000L): DataFrame = {
    val all = coPurchasePairs(lineitem)
    val hist = all.groupBy(col("cooc"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val support = wedgeSupportFor(hist, minSupportFloor, edgeBudget)
    val pairs = hold(all
      .where(col("cooc") >= support)
      .select(col("part_a"), col("part_b")))
    val edges = pairs.unionAll(
      pairs.select(col("part_b"), col("part_a"))).toDF("src", "dst")
    // the center's TRUE degree rides with its wedge pairs: the
    // resource-allocation index Σ 1/deg(center) down-weights hub
    // centers (two items co-bought with milk means nothing; with a
    // niche lens kit, everything). Integer micro-units (10⁶ div deg)
    // keep the pair sums order-independent — a float Σ1/deg would be
    // shuffle-order-dependent in the last ULP.
    val nbrs = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"),
        slice(sort_array(collect_set(col("dst"))), 1, neighborCap)
          .as("ns"))
    val cand = nbrs.where(size(col("ns")) >= 2)
      .select(expr("1000000 div deg").as("ra"),
        explode(call_function("graft_pairs", col("ns"))).as("p"))
      .groupBy(col("p.a").as("part_u"), col("p.b").as("part_w"))
      .agg(count(lit(1)).as("n_common"), sum(col("ra")).as("ra_micro"))
    cand.join(pairs,
        col("part_u") === col("part_a") && col("part_w") === col("part_b"),
        "left_anti")
      .withColumn("min_support", lit(support.toLong))
      .orderBy(col("ra_micro").desc, col("part_u"), col("part_w"))
      .limit(topN)
  }

  def pageRank(lineitem: DataFrame, iters: Int = 3,
               topN: Int = 100): DataFrame = {
    val pairs = coPairs(lineitem)
    val edges = pairs.unionAll(
      pairs.select(col("part_b"), col("part_a"))).toDF("src", "dst")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // static over all iterations: partition edges AND nodes on the
    // SAME key with an EXPLICIT partition count and persist. The
    // explicit count matters twice: AQE never coalesces a
    // user-numbered repartition, so both cached layouts come out at
    // exactly P, and every iteration's rank frame (built from
    // `nodes`, layout preserved through the co-partitioned join and
    // localCheckpoint) is ALREADY hashpartitioning(node=src, P) — the
    // per-round rank join and the rank rebuild join plan with zero
    // Exchange. Round 13 partitioned only the edge side; the rank
    // frame re-exchanged every round (3 extra shuffles of the node
    // frame per query).
    val p = lineitem.sparkSession.sessionState.conf.numShufflePartitions
    val edgesDeg = hold(edges.join(deg, "src")
      .repartition(p, col("src")))
    val nodes = hold(deg.select(col("src").as("node"))
      .repartition(p, col("node")))
    // materialize BOTH caches before planning iteration 1: an
    // un-materialized AQE-planned cache reports unknown partitioning
    // to the consumer's EnsureRequirements (measured: every iteration
    // re-exchanged both cached sides), a final one reports the
    // repartition layout and the iteration joins plan with no
    // Exchange on the cached inputs. One union job fills both caches
    // (separate counts would serialize two jobs and re-run the deg
    // aggregate)
    edgesDeg.select(col("src"))
      .unionAll(nodes.select(col("node"))).count()
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      // SHUFFLE_HASH: build the node-sized rank frame, STREAM the
      // static edge frame — a sort-merge join would re-sort the edge
      // partitions every round (the edges never change), and a
      // broadcast would cap the node count at driver memory
      val inflow = edgesDeg
        .join(ranks.hint("SHUFFLE_HASH"), edgesDeg("src") === ranks("node"))
        .select(col("dst"), expr("((rank_micro * 17) div 20) div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      // localCheckpoint: cut lineage per round — the iterated plan
      // would otherwise double per iteration (the Lloyd pattern)
      ranks = nodes.join(inflow.hint("SHUFFLE_HASH"),
          nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          (lit(150000L) + coalesce(col("inflow"), lit(0L))).as("rank_micro"))
      if (sys.env.contains("SPARK_GRAFT_PR_EXPLAIN")) ranks.explain("formatted")
      ranks = ranks.localCheckpoint()
    }
    ranks.orderBy(col("rank_micro").desc, col("node")).limit(topN)
      .select(col("node").as("part"), col("rank_micro"))
  }

  /** Unrolled-peel depth shared with the k-core oracle (CAPS.md):
    * both engines apply at most this many simultaneous-removal
    * rounds, so a pathologically slow-converging graph produces the
    * SAME depth-capped state on both sides instead of silent
    * divergence (peeling is idempotent once stable, so extra oracle
    * rounds after convergence are no-ops). Observed convergence on
    * the min-support co-purchase graph: ≤ 6 rounds at every tested
    * SF — a 4× margin. */
  val KCoreMaxPeels: Int = 24

  /** Corpus-derived coreness threshold (the wedgeSupportFor /
    * blockCharsFor discipline): k = max(kFloor, ⌈edges/nodes⌉), i.e.
    * half the average degree — a FIXED k is degenerate across
    * density regimes (the sf0.001 support graph is a near-clique
    * where k=3 peels nothing; at sf0.1 it is a sparse forest where
    * k=3 peels everything). Integer ceil-div, replayed exactly. */
  def kCoreKFor(nEdges: Long, nNodes: Long, kFloor: Int = 2): Int = {
    require(kFloor >= 1, "kFloor must be at least 1")
    if (nNodes == 0L) kFloor
    else math.max(kFloor.toLong, (nEdges + nNodes - 1L) / nNodes).toInt
  }

  /** k-core of the min-support co-purchase graph: the maximal
    * subgraph where every item still has ≥ k co-purchase partners —
    * the standard "dense cohesive catalog cluster" extraction
    * (Seidman '83) behind community seeding and graph sampling.
    * Returns the surviving nodes with their in-core degree plus the
    * derived k, so the derivation itself is hash-checked.
    *
    * Shape: the classic simultaneous peel — each round is one
    * node-grain degree aggregate over the current edge set plus two
    * left-SEMI joins dropping edges with a low-degree endpoint; the
    * edge set only shrinks, lineage is cut per round with
    * localCheckpoint (the PageRank pattern), and the loop stops at
    * the fixpoint (equal edge count ⟺ equal set, since peeling only
    * removes) or at [[KCoreMaxPeels]], whichever comes first. Work
    * per round is O(current edges); the min-support frame bounds the
    * starting edge volume (CAPS.md). The oracle replays the same
    * bounded peel as [[KCoreMaxPeels]] unrolled CTE steps. */
  def kCore(lineitem: DataFrame, minSupport: Int = 2,
            kFloor: Int = 2): DataFrame = {
    val pairs0 = coPurchasePairs(lineitem)
      .where(col("cooc") >= minSupport)
      .select(col("part_a"), col("part_b"))
    val st = pairs0
      .select(explode(array(col("part_a"), col("part_b"))).as("node"))
      .agg(count(lit(1)).as("e2"), countDistinct(col("node")).as("n"))
      .head()
    val k = kCoreKFor(st.getLong(0) / 2, st.getLong(1), kFloor)
    var cur = pairs0.localCheckpoint()
    var curCount = cur.count()
    var stable = curCount == 0L
    var round = 0
    while (!stable && round < KCoreMaxPeels) {
      val good = cur
        .select(explode(array(col("part_a"), col("part_b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("node"))
      val next = cur
        .join(good.select(col("node").as("part_a")), Seq("part_a"), "left_semi")
        .join(good.select(col("node").as("part_b")), Seq("part_b"), "left_semi")
        .localCheckpoint()
      val nextCount = next.count()
      stable = nextCount == curCount
      cur = next
      curCount = nextCount
      round += 1
    }
    cur.select(explode(array(col("part_a"), col("part_b"))).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("core_deg"))
      .select(col("part"), col("core_deg"), lit(k).cast("int").as("k"))
      .orderBy(col("part"))
  }
}
