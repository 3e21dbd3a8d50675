package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, NearDup}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val df = (0L until 400L).map(i =>
      (i, s"doc $i", if (i % 2 == 0) "en" else "fr", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val rates = Map("en" -> 0.5, "fr" -> 1.0)
    val a = Curation.stratifiedSample(df, rates).collect()
    val b = Curation.stratifiedSample(df, rates).collect()
    assert(a.toSeq == b.toSeq, "hash sampling must be rerun-stable")
    val kept = a.map(r => r.getLong(0)).toSet
    // every fr doc survives; en is a strict non-empty subset
    assert((1L until 400L by 2).forall(kept))
    val en = kept.filter(_ % 2 == 0)
    assert(en.nonEmpty && en.size < 200)
    // sampling decisions are per-doc: restricting the corpus never
    // flips an existing doc's decision (incremental-run stability)
    val half = Curation.stratifiedSample(df.where(col("doc_id") < 200), rates)
      .collect().map(_.getLong(0)).toSet
    assert(half == kept.filter(_ < 200L))
  }

  test("stratifiedSample drops strata with no configured rate") {
    val df = Seq((1L, "x", "en", "s"), (2L, "x", "xx", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val kept = Curation.stratifiedSample(df, Map("en" -> 1.0))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("stratifiedSample needs only doc_id and the stratum column") {
    // no 'source' column: the operator must not reference one unless
    // asked to pass it through
    val df = Seq((1L, "en"), (2L, "fr")).toDF("doc_id", "lang")
    val out = Curation.stratifiedSample(df, Map("en" -> 1.0, "fr" -> 1.0))
    assert(out.columns.toSeq == Seq("doc_id", "lang", "bucket"))
    assert(out.count() == 2)
  }

  test("blocklistFilter counts hits, names the first term, NULLs empty docs") {
    val df = docs(
      1L -> "bad bad word word word word word word word word",
      2L -> "clean words only here today",
      3L -> "",
      4L -> (null: String))
    val out = Curation.blocklistFilter(df, Seq("bad", "worse"), 0.1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(2) == 2 && out(1L).getString(3) == "bad")
    assert(!out(1L).getBoolean(5), "20% hits > 10% threshold: dropped")
    assert(out(2L).getInt(2) == 0 && out(2L).isNullAt(3))
    assert(out(2L).getBoolean(5))
    // zero tokens: fraction and flag are NULL, not a division error
    assert(out(3L).isNullAt(4) && out(3L).isNullAt(5))
    // NULL text propagates NULL counts (legacy size(NULL) is -1, which
    // would otherwise leak through as n_toks=-1, frac=1.0, kept=false)
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(2)
      && out(4L).isNullAt(4) && out(4L).isNullAt(5))
  }

  test("chunks cover every token with the configured overlap") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val out = Curation.chunks(docs(1L -> text), size = 32, stride = 24)
      .collect()
    // ceil((100-32)/24)+1 = 4 windows at starts 0,24,48,72
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.getInt(2)).toSeq == Seq(0, 24, 48, 72))
    // all full except the 28-token tail; 72+28 = 100 → full coverage
    assert(out.map(_.getInt(3)).toSeq == Seq(32, 32, 32, 28))
  }

  test("chunks: short docs get one window, empty docs none") {
    val out = Curation.chunks(docs(1L -> "a b c", 2L -> ""), 32, 24).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getInt(3) == 3)
  }

  test("chunkDedup finds a window repeated across docs") {
    val boiler = (1 to 40).map(i => s"b$i").mkString(" ")
    val df = docs(
      1L -> s"$boiler unique one tail text here",
      2L -> s"$boiler different ending entirely now ok",
      3L -> "no shared window in this document at all")
    val out = Curation.chunkDedup(df, 32, 24).collect()
    // the first 32-token window of docs 1 and 2 is identical
    assert(out.exists(r => r.getLong(1) == 2 && r.getLong(2) == 2
      && r.getLong(3) == 1L))
    assert(out.forall(_.getLong(1) > 1))
  }

  test("decontaminate flags only train docs sharing an n-gram with eval") {
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val all = docs(
      1L -> s"$shared plus some extra training tokens",
      2L -> "completely unrelated training document text here",
      3L -> s"eval doc containing $shared inside it",
      4L -> "tiny")
    val out = NearDup.decontaminate(
      all.where(col("doc_id") =!= 3L), all.where(col("doc_id") === 3L), 8)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val r = out.head
    // doc 1 shares the 3 8-grams inside the 10 shared tokens
    assert(r.getLong(1) == 3L)
    assert(r.getInt(2) > 3 && r.getDouble(3) > 0 && r.getDouble(3) < 1)
  }

  test("packChunks: greedy in-order bins, straddling allowed, partition-proof") {
    // 10 docs × 40 tokens → chunks of 32+8 per doc: (32, 8)? no —
    // 40 tokens, size 32, stride 24 → starts 0, 24: windows 32 and 16
    val df = (0L until 10L).map(i =>
      (i, (1 to 40).map(j => s"d${i}t$j").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .repartition(7) // bins must not depend on physical layout
    val out = Curation.packChunks(df, contextLen = 100, 32, 24)
      .orderBy("doc_id", "chunk_ix").collect()
    assert(out.length == 20)
    // per-doc token sequence is 32,16 → exclusive prefix 0,32,48,80,...
    val prefixes = out.scanLeft(0L)((acc, r) => acc + r.getInt(3)).init
    out.zip(prefixes).foreach { case (r, p) =>
      assert(r.getLong(5) == p / 100, s"bin_id at prefix $p")
      assert(r.getLong(6) == p % 100, s"bin_offset at prefix $p")
    }
    // total 480 tokens → bins 0..4; chunk at prefix 80 straddles into bin 0
    assert(out.map(_.getLong(5)).max == 4)
  }

  test("packFragmentation: docs-per-bin grid, straddles, shares sum to 1") {
    // same fixture as the packChunks test: 20 chunks of (32,16) per
    // doc, 480 tokens into 100-token bins → 5 bins, each spanning
    // chunks of 2-3 distinct docs
    val df = (0L until 10L).map(i =>
      (i, (1 to 40).map(j => s"d${i}t$j").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .repartition(7)
    val out = Curation.packFragmentation(df, contextLen = 100, 32, 24)
      .collect()
    assert(out.map(_.getLong(1)).sum == 5L, "total bins = 480 // 100 + 1")
    assert(out.map(_.getLong(2)).sum == 20L, "every chunk attributed once")
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-12)
    // chunk starting at prefix 80 (len 32) crosses into bin 1 — at
    // least one straddle exists and every straddle is counted in the
    // bin the chunk STARTS in
    assert(out.map(_.getLong(3)).sum >= 1L)
  }

  test("curationFunnel: labeled stages, monotone survival, strata filter") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Curation.curationFunnel(real, Seq("slow"), 0.12,
      Map("en" -> 1.0)).collect()
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("raw", "quality", "blocklist", "dedup", "sample"))
    assert(rows.head.getLong(2) == real.count())
    val nDocs = rows.map(_.getLong(2))
    val nToks = rows.map(_.getLong(3))
    assert(nDocs.zip(nDocs.tail).forall { case (a, b) => b <= a },
      s"docs not monotone: ${nDocs.toSeq}")
    assert(nToks.zip(nToks.tail).forall { case (a, b) => b <= a })
    // en-only rates: the sample stage keeps a nonempty strict subset
    // (the corpus has five languages)
    assert(nDocs.last > 0 && nDocs.last < nDocs(3))
  }

  test("vocabulary: counts, doc frequencies, deterministic top-N cut") {
    val df = docs(
      1L -> "apple apple banana", 2L -> "apple cherry", 3L -> "banana date")
    val all = graft.operators.TextAnalysis.vocabulary(df, 10).collect()
    assert(all.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("apple", 3L, 2L), ("banana", 2L, 2L),
        ("cherry", 1L, 1L), ("date", 1L, 1L)))
    // ties at the cut resolve by term, so the top-N is deterministic
    val top3 = graft.operators.TextAnalysis.vocabulary(df, 3).collect()
    assert(top3.map(_.getString(0)).toSeq == Seq("apple", "banana", "cherry"))
  }

  test("topQualityPerSource keeps the best N per source, ranked") {
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "while a small bird sings of summer days in the green field"
    val df = (0L until 8L).map { i =>
      // progressively worse docs: shorter text → lower quality score
      (i, base.split(" ").take(25 - i.toInt * 2).mkString(" "),
        "en", s"src${i % 2}")
    }.toDF("doc_id", "text", "lang", "source")
    val out = Curation.topQualityPerSource(df, 2).collect()
    assert(out.length == 4)
    // per source, the two LONGEST (= highest score) docs win, rank 1,2
    assert(out.map(r => (r.getString(1), r.getInt(3), r.getLong(0))).toSeq ==
      Seq(("src0", 1, 0L), ("src0", 2, 2L), ("src1", 1, 1L), ("src1", 2, 3L)))
  }

  test("domainPolicy: dup/low-quality drop, good keeps, shorts sample") {
    val unit = "the quick brown fox and the lazy dog of summer is here to stay"
    val good = Seq.fill(9)(unit).mkString(" ")         // ~126 toks, q≈0.56
    val low = Seq.fill(2)(unit).mkString(" ")          // 28 toks, q≈0.16
    val rows =
      (1L to 4L).map(i => (i, good, "srcA")) ++        // 4 identical copies
      (11L to 14L).map(i => (i, good + s" zebra$i", "srcB")) ++ // distinct
      Seq((21L, good + " zebraone", "srcE"), (22L, good + " zebratwo", "srcE"),
        (23L, "tiny doc here", "srcE")) ++             // 1/3 short → sample
      Seq((26L, low + " zebraone", "srcC"), (27L, low + " zebratwo", "srcC")) ++
      Seq((31L, "", "srcD"))                           // empty → NULL score
    val df = rows.toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
    val out = Curation.domainPolicy(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("srcA").getLong(1) == 4 && out("srcA").getDouble(2) == 1.0)
    assert(out("srcA").getString(5) == "drop", "all-dup domain drops")
    assert(out("srcB").getDouble(2) == 0.0 &&
      out("srcB").getDouble(4) > 0.45 && out("srcB").getString(5) == "keep")
    assert(out("srcE").getString(5) == "sample",
      s"short-heavy domain samples (short=${out("srcE").getDouble(3)})")
    assert(out("srcC").getDouble(4) < 0.23 &&
      out("srcC").getString(5) == "drop", "low-quality domain drops")
    assert(out("srcD").isNullAt(4) && out("srcD").getString(5) == "drop",
      "unscorable domain drops explicitly")
  }

  test("weightedSample: k per stratum, rerun-stable, zero-weight excluded") {
    val df = ((1L to 10L).map(i =>
      (i, Seq.fill(i.toInt)("word").mkString(" "), "a")) ++
      Seq((21L, "hello world", "b"), (22L, "", "b")))
      .toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
    val out = Curation.weightedSample(df, 3).collect()
    val byst = out.groupBy(_.getString(0))
    assert(byst("a").length == 3, "binds on the large stratum")
    assert(byst("a").map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
    assert(byst("b").map(_.getLong(1)).toSeq == Seq(21L),
      "zero-weight (empty) docs can never be drawn, short stratum kept")
    assert(Curation.weightedSample(df, 3).collect().map(_.getLong(1)).toSet
      == out.map(_.getLong(1)).toSet, "A-ES keys are rerun-stable")
  }

  test("dedupIncrement flags exact, near, and fresh docs vs the corpus") {
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = docs(10L -> body, 11L -> "an unrelated corpus document here")
    val fresh = (1 to 30).map(i => s"z$i").mkString(" ")
    val nearTxt = (1 to 28).map(i => s"w$i").mkString(" ") + " tail changed"
    val newDocs = docs(20L -> body, 21L -> nearTxt, 22L -> fresh)
    val out = NearDup.dedupIncrement(newDocs, corpus)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(20L).getLong(1) == 10L, "identical doc: exact match")
    assert(!out(20L).getBoolean(3))
    assert(out(21L).isNullAt(1) && out(21L).getLong(2) == 10L,
      "high-jaccard doc: near match only")
    assert(out(22L).isNullAt(1) && out(22L).isNullAt(2)
      && out(22L).getBoolean(3), "fresh doc is new")
  }

  test("indexStaleness: fresh index is not stale, drifted corpus is") {
    import org.apache.spark.sql.functions.{col, md5}
    import graft.functions.TextFunctions.normText
    val corpus = docs((1L to 20L).map(i => i -> s"unique document body $i"): _*)
    def fp(df: org.apache.spark.sql.DataFrame) =
      df.select(md5(normText(col("text"))).as("fp"))
    // same corpus both sides: zero drift, not stale
    val fresh = NearDup.indexStaleness(corpus, fp(corpus)).collect().head
    assert(fresh.getLong(0) == 20L && fresh.getLong(1) == 20L)
    assert(fresh.getLong(2) == 0L && fresh.getLong(3) == 0L)
    assert(!fresh.getBoolean(8), "no drift -> not stale")
    // 25% of the live corpus unseen by the snapshot -> new_frac 0.25
    // over the 10% threshold; nothing deleted -> gone_frac 0
    val grown = corpus.unionAll(
      docs((21L to 26L).map(i => i -> s"drifted new body $i"): _*)
        .select(corpus.columns.map(col): _*))
    val drift = NearDup.indexStaleness(grown, fp(corpus)).collect().head
    assert(drift.getLong(2) == 6L && drift.getLong(3) == 0L)
    assert(drift.getBoolean(8), "23% unseen fingerprints -> stale")
    // deletes: live corpus lost half the snapshot -> gone_frac 0.5
    val shrunk = corpus.where(col("doc_id") <= 10L)
    val gone = NearDup.indexStaleness(shrunk, fp(corpus)).collect().head
    assert(gone.getLong(2) == 0L && gone.getLong(3) == 10L)
    assert(gone.getBoolean(8), "half the index gone -> stale")
  }

  test("published dedup index probes row-identically to an in-session build") {
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = docs(10L -> body, 11L -> "an unrelated corpus document here")
    val fresh = (1 to 30).map(i => s"z$i").mkString(" ")
    val nearTxt = (1 to 28).map(i => s"w$i").mkString(" ") + " tail changed"
    val newDocs = docs(20L -> body, 21L -> nearTxt, 22L -> fresh)
    val direct = NearDup.dedupIncrement(newDocs, corpus).collect().toSeq
    // publish once, probe the frozen catalog artifacts — the
    // operational 100 TB cadence (index written per corpus snapshot,
    // increments never re-scan corpus text)
    val prefix = "graft_dedup_spec"
    NearDup.publishIncrementIndex(corpus, prefix = prefix)
    val loaded = NearDup.loadIncrementIndex(spark, prefix = prefix)
    val served = NearDup.dedupIncrementAgainst(newDocs, loaded)
      .collect().toSeq
    assert(served == direct,
      "probe against the loaded index must be row-identical")
    // the loaded artifacts also serve the STREAMING probe shape: the
    // exact+near verdicts come from the same three frames
    Seq(NearDup.fpTable(prefix), NearDup.bucketsTable(prefix),
      NearDup.sigsTable(prefix)).foreach { t =>
      assert(spark.table(t).count() > 0)
      spark.sql(s"DROP TABLE $t")
    }
  }

  test("freshIncrementIndex rebuilds on drift, serves published otherwise") {
    val body = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = docs(10L -> body, 11L -> "an unrelated corpus document here")
    val prefix = "graft_dedup_fresh_spec"
    NearDup.publishIncrementIndex(corpus, prefix = prefix)
    // same corpus: verdict not stale, the published snapshot is served
    val (idx0, rebuilt0) = NearDup.freshIncrementIndex(corpus, prefix = prefix)
    assert(!rebuilt0, "zero drift must not trigger a rebuild")
    assert(idx0.fingerprints.count() == 2)
    // the live corpus grows past the 10% new-fingerprint threshold; a
    // probe of a near-dup of the NEW doc against the frozen snapshot
    // would come back is_new (the silent under-flagging failure) —
    // the staleness-aware path must rebuild first and catch it
    val freshBody = (1 to 30).map(i => s"q$i").mkString(" ")
    val grown = corpus.unionAll(
      docs(12L -> freshBody).select(corpus.columns.map(col): _*))
    val nearOfNew = docs(
      20L -> ((1 to 28).map(i => s"q$i").mkString(" ") + " tail changed"))
    val staleVerdict = NearDup
      .dedupIncrementAgainst(nearOfNew,
        NearDup.loadIncrementIndex(spark, prefix = prefix))
      .collect().head
    assert(staleVerdict.getBoolean(3),
      "the frozen snapshot misses the new family (the hazard)")
    val (idx1, rebuilt1) = NearDup.freshIncrementIndex(grown, prefix = prefix)
    assert(rebuilt1, "33% unseen fingerprints must trigger the rebuild")
    assert(idx1.fingerprints.count() == 3,
      "the served index is the REBUILT snapshot")
    val freshVerdict = NearDup.dedupIncrementAgainst(nearOfNew, idx1)
      .collect().head
    assert(!freshVerdict.getBoolean(3) && freshVerdict.getLong(2) == 12L,
      "after the rebuild the probe flags the near-dup of the new doc")
    Seq(NearDup.fpTable(prefix), NearDup.bucketsTable(prefix),
      NearDup.sigsTable(prefix)).foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("freshIncrementIndex bootstraps a never-published prefix") {
    val corpus = docs(1L -> (1 to 30).map(i => s"b$i").mkString(" "),
      2L -> "a second unrelated document body")
    val prefix = "graft_dedup_boot_spec"
    // no snapshot exists: "serve a fresh index" must hold from call
    // one (publish from the live corpus, flag the cold start) instead
    // of throwing on the missing catalog tables
    val (idx, rebuilt) = NearDup.freshIncrementIndex(corpus, prefix = prefix)
    assert(rebuilt, "cold start must publish and report rebuilt=true")
    assert(idx.fingerprints.count() == 2)
    // the bootstrap published: the next call serves the snapshot
    val (_, rebuilt2) = NearDup.freshIncrementIndex(corpus, prefix = prefix)
    assert(!rebuilt2, "the bootstrapped snapshot must serve without drift")
    Seq(NearDup.fpTable(prefix), NearDup.bucketsTable(prefix),
      NearDup.sigsTable(prefix)).foreach(t => spark.sql(s"DROP TABLE $t"))
  }

  test("lshCurve and minhashEstCurve calibrate banding and sketch") {
    val body = (1 to 40).map(i => s"w$i").mkString(" ")
    val far = (1 to 40).map(i => s"z$i").mkString(" ")
    val df = docs(1L -> body, 2L -> body, 3L -> far)
    // identical docs: jaccard 1.0 → decile 9 (clamped), every band
    // collides → candidate rate 1; theoretical at s=0.95 off the
    // exact squaring chain
    val curve = NearDup.lshCurve(df, 3).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(curve.keySet == Set(9))
    val c9 = curve(9)
    assert(c9.getLong(1) == 1L && c9.getLong(2) == 1L)
    assert(c9.getDouble(3) == 1.0, "identical docs must be candidates")
    def sq(x: Double) = x * x
    assert(c9.getDouble(5) == 1.0 - sq(sq(sq(sq(1.0 - 0.95 * 0.95)))),
      "expected_rate is the exact squaring chain at the midpoint")
    // identical signatures agree on all 32 coordinates: est exactly 1,
    // exact mean exactly 1, zero bias
    val est = NearDup.minhashEstCurve(df, 3).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(est.keySet == Set(9))
    val e9 = est(9)
    assert(e9.getLong(1) == 1L)
    assert(e9.getDouble(2) == 1.0 && e9.getDouble(3) == 1.0
      && e9.getDouble(4) == 0.0)
  }

  test("containment finds short-in-long dups that jaccard misses") {
    val short = (1 to 12).map(i => s"s$i").mkString(" ")
    val filler = (1 to 120).map(i => s"f$i").mkString(" ")
    val df = docs(1L -> short, 2L -> s"$short $filler")
    val cont = NearDup.containmentPairs(df, 3, 0.9).collect()
    assert(cont.length == 1)
    assert(cont.head.getDouble(2) == 1.0, "short doc fully contained")
    val jac = NearDup.jaccardPairs(df, 3, 0.3).collect()
    assert(jac.isEmpty, "symmetric jaccard misses the containment pair")
  }

  test("mixturePlan normalizes weights, budgets tokens, computes epochs") {
    // s1: 4 tokens, s2: 6 tokens; weights s1=3, s2=1; budget = half
    // the 10-token corpus → targets 3.75 / 1.25 → floor 3 / 1 tokens
    val df = Seq(
      (1L, "w w w w", "s1"), (2L, "x x x", "s2"), (3L, "y y y", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Curation.mixturePlan(df, Map("s1" -> 3.0), 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("s1").getLong(1) == 1 && out("s1").getLong(2) == 4)
    assert(out("s2").getLong(2) == 6)
    assert(out("s1").getDouble(3) == 0.4 && out("s2").getDouble(3) == 0.6)
    assert(out("s1").getDouble(4) == 0.75 && out("s2").getDouble(4) == 0.25)
    assert(out("s1").getLong(5) == 3 && out("s2").getLong(5) == 1)
    assert(out("s1").getDouble(6) == 3.0 / 4.0, "s1 upweighted epochs")
    assert(out("s2").getDouble(6) == 1.0 / 6.0)
    // NULL-text source: zero tokens, NULL epochs rather than /0
    val withNull = df.unionAll(Seq((4L, null: String, "s3"))
      .toDF("doc_id", "text", "source"))
    val o2 = Curation.mixturePlan(withNull, Map("s1" -> 3.0), 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(o2("s3").getLong(2) == 0 && o2("s3").isNullAt(6))
  }

  test("materializeMixture repeats full epochs and samples the fraction") {
    // one source, 20 docs with 1 token each; budgetFactor 2.5 on a
    // single source → epochs 2.5: every doc gets 2 copies, the salted
    // md5-bucket half a 3rd
    val df = (1L to 20L).map(i => (i, "w", "s1"))
      .toDF("doc_id", "text", "source")
    val out = Curation.materializeMixture(df, Map.empty, 2.5)
      .collect()
    val copies = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(copies.values.forall(c => c == 2 || c == 3))
    assert(copies.values.exists(_ == 2) && copies.values.exists(_ == 3),
      "fractional epoch splits the population")
    assert(out.map(r => (r.getLong(0), r.getLong(2))).distinct.length ==
      out.length, "copy_ix enumerates each doc's copies")
    // deterministic: same plan twice → same manifest
    val again = Curation.materializeMixture(df, Map.empty, 2.5).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(2))).toSet)
    // epochs < 1 → pure downsample, no doc repeated
    val down = Curation.materializeMixture(df, Map.empty, 0.5).collect()
    assert(down.groupBy(_.getLong(0)).values.forall(_.length == 1))
    assert(down.length < 20 && down.nonEmpty)
  }

  test("fixedSample takes exactly N per stratum, hash-deterministic") {
    val df = ((1L to 20L).map(i => (i, "en")) ++ (21L to 25L).map(i => (i, "fr")))
      .toDF("doc_id", "lang")
    val out = Curation.fixedSample(df, 8, "lang").collect()
    val bySt = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(bySt("en").size == 8, "binds on the large stratum")
    assert(bySt("fr") == (21L to 25L).toSet, "short stratum kept whole")
    // rerun-stable: same selection both times
    assert(Curation.fixedSample(df, 8, "lang").collect()
      .map(_.getLong(0)).toSet == out.map(_.getLong(0)).toSet)
    // ranks enumerate 1..N within each stratum
    assert(out.filter(_.getString(1) == "en").map(_.getInt(2)).sorted.toSeq
      == (1 to 8))
  }

  test("boilerplateStrip drops corpus-frequent lines, keeps unique ones") {
    // 10 docs: every doc carries the banner line, doc 0-4 also a
    // footer; each doc's body line is unique. threshold 1-in-2.
    val df = docs((0L until 10L).map { i =>
      val footer = if (i < 5) "\nCopyright Foo" else ""
      (i, s"unique body $i\nBanner line$footer")
    }: _*)
    val out = Curation.boilerplateStrip(df, maxDocEvery = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 10)
    // banner (10/10) and footer (5/10) are both >= 1/2 -> stripped
    assert(out(0L).getInt(1) == 3 && out(0L).getInt(2) == 2)
    assert(out(0L).getString(3) == "unique body 0")
    assert(out(7L).getInt(1) == 2 && out(7L).getInt(2) == 1)
    assert(out(7L).getString(3) == "unique body 7")
    // NULL text propagates NULL
    val withNull = docs((0L, "a\nB"), (1L, "b\nB"),
      (2L, null.asInstanceOf[String]))
    val nres = Curation.boilerplateStrip(withNull, maxDocEvery = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(nres(2L).isNullAt(1) && nres(2L).isNullAt(3))
    assert(nres(0L).getString(3) == "a")
  }

  test("splitLeak classifies near-dup pairs by their salted-hash splits") {
    val dup = Seq.fill(4)("alpha beta gamma delta epsilon zeta").mkString(" ")
    val df = docs((0L, dup), (1L, dup),
      (2L, "totally different words here about fish migration"),
      (3L, "unrelated text on another topic entirely for sure"))
    val out = Curation.splitLeak(df,
      buckets = 10, trainBuckets = 5, valBuckets = 3).collect()
    // replay the salted split assignment independently
    def split(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:split".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val b = java.lang.Long.parseLong(hex, 16) % 10
      if (b < 5) "train" else if (b < 8) "val" else "test"
    }
    val exp = Seq(split(0L), split(1L)).sorted
    assert(out.length == 1, "only the planted dup pair may surface")
    assert(out.head.getString(0) == exp.head &&
      out.head.getString(1) == exp(1))
    assert(out.head.getLong(2) == 1L)
    assert(out.head.getInt(3) == (if (exp.head == exp(1)) 0 else 1))
  }

  test("shardPlan: bucketed rank == global rank; tokens serpentine-balanced") {
    // 100 docs, token counts cycling 1..17 — many cross-bucket ties
    val df = docs((0L until 100L).map(i =>
      (i, Seq.fill((i % 17 + 1).toInt)("w").mkString(" "))): _*)
    val out = Curation.shardPlan(df, shards = 4, buckets = 8).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.size == 4 && out.values.map(_.getLong(1)).sum == 100L)
    // naive replay: global sort desc by (toks, doc_id), serpentine
    val expected = (0L until 100L).map(i => (i, i % 17 + 1))
      .sortBy { case (id, t) => (-t, id) }.zipWithIndex
      .map { case ((_, t), rk) =>
        val pos = rk % 4
        (if ((rk / 4) % 2 == 0) pos else 3 - pos) -> t
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    (0 to 3).foreach { s =>
      assert(out(s).getLong(2) == expected(s),
        s"shard $s token sum must equal the global-rank serpentine")
    }
    val sums = out.values.map(_.getLong(2))
    assert(sums.max - sums.min <= 17, "balance within one max-doc")
    // degenerate corpus: every doc identical -> one bucket, still exact
    val flat = docs((0L until 9L).map(i => (i, "a b c")): _*)
    val fo = Curation.shardPlan(flat, shards = 3, buckets = 8).collect()
    assert(fo.map(_.getLong(1)).toSeq == Seq(3L, 3L, 3L))
    assert(fo.map(_.getLong(2)).toSeq == Seq(9L, 9L, 9L))
  }

  test("hashSplit is rerun-stable and shares sum to one") {
    import graft.operators.Curation
    val small = docs((1L to 200L).map(i => (i, s"doc $i words here")): _*)
    val big = docs((1L to 400L).map(i => (i, s"doc $i words here")): _*)
    val sOf = (df: org.apache.spark.sql.DataFrame) =>
      Curation.hashSplit(df).collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(4))).toMap
    val (s1, s2) = (sOf(small), sOf(big))
    // shares sum to 1 exactly (counts over one total)
    assert(math.abs(s1.values.map(_._2).sum - 1.0) < 1e-12)
    // doubling the corpus grows every split; the 80/10/10 shape holds
    // loosely (hash noise at n=400) and train stays the bulk
    assert(s2("train")._1 > s2("val")._1 && s2("train")._1 > s2("test")._1)
    assert(s2.values.map(_._1).sum == 400L)
    // rerun stability at the assignment level: each doc keeps its
    // split when the corpus doubles — counts over the common prefix
    // are monotone (every small-corpus member is in the big corpus)
    assert(s1.values.map(_._1).sum == 200L)
    assert(s1.keys.forall(k => s2(k)._1 >= s1(k)._1))
  }

  test("tokenBudgetPlan caps the small source and re-levels the rest") {
    // A: 2 tokens at weight 2 (capped — its fair share exceeds its
    // supply); B: 100 tokens at weight 1. Budget = 51 of 102.
    val df = Seq(
      (1L, "a b", "A"),
      (2L, (1 to 100).map(i => s"w$i").mkString(" "), "B"))
      .toDF("doc_id", "text", "source")
    val out = Curation.tokenBudgetPlan(df,
        when(col("source") === "A", lit(2L)).otherwise(lit(1L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4 - 2),
        r.getBoolean(4), r.getLong(5))).sortBy(_._1)
    // (source, avail, weight, capped, allocated)
    assert(out.toSeq == Seq(
      ("A", 2L, 2L, true, 2L),
      ("B", 100L, 1L, false, 49L)))
  }

  test("curriculumPlan tiers are equal-population and quality-ordered") {
    val df = Seq(
      (1L, "the cat and the dog ran to the house of the man"),
      (2L, "zz qq ww"),
      (3L, "the quick brown fox jumps over the lazy dog again"),
      (4L, "x1 9 9 9 9 9"))
      .toDF("doc_id", "text")
    val out = Curation.curriculumPlan(df, buckets = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(out.map(_._1).toSeq == Seq(1, 2))
    assert(out.map(_._2).toSeq == Seq(2L, 2L))
    // tier 1's worst doc still scores >= tier 2's best
    assert(out(0)._4 >= out(1)._5)
    // cumulative tokens: tier2 cum = tier1 + tier2
    assert(out(1)._6 == out(0)._3 + out(1)._3)
  }

  test("sourceGini: equal sources zero, concentration positive") {
    // equal: two sources, 2 docs / 4 tokens each -> both ginis 0
    val eq = Seq((1L, "a b", "s1"), (2L, "c d", "s1"),
      (3L, "e f", "s2"), (4L, "g h", "s2"))
      .toDF("doc_id", "text", "source")
    val r0 = Curation.sourceGini(eq).collect().head
    assert(r0.getLong(0) == 2L && r0.getDouble(1) == 0.0 &&
      r0.getDouble(2) == 0.0 && r0.getDouble(3) == 0.5)
    // skewed tokens, equal docs: doc gini 0, token gini > 0
    val sk = Seq((1L, "a b c d e f", "s1"), (2L, "x y", "s2"))
      .toDF("doc_id", "text", "source")
    val r1 = Curation.sourceGini(sk).collect().head
    assert(r1.getDouble(1) == 0.0 && r1.getDouble(2) > 0.0)
    assert(r1.getDouble(4) == 0.75, "6 of 8 tokens in s1")
  }

  test("ingestMix: id-grid buckets, in-bucket vs overall drift") {
    // ids 1..4 in 2 buckets: {1,2} and {3,4}; source x drifts out
    val d = Seq(
      (1L, "x"), (2L, "x"),     // bucket 1: all x
      (3L, "x"), (4L, "y"))     // bucket 2: half x
      .toDF("doc_id", "source")
    val out = Curation.ingestMix(d, buckets = 2).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out((1L, "x")) == ((2L, 1.0, 0.75, 0.25)))
    assert(out((2L, "x")) == ((1L, 0.5, 0.75, -0.25)))
    assert(out((2L, "y")) == ((1L, 0.5, 0.25, 0.25)))
  }

  test("mixtureTemperature: sqrt smoothing damps the head, boosts the tail") {
    // a: 16 tokens, b: 4, c: 0 -> avail 0.8 / 0.2 / 0
    val d = Seq(
      (1L, "w w w w w w w w w w w w w w w w", "a"),
      (2L, "w w w w", "b"),
      (3L, "", "c"))
      .toDF("doc_id", "text", "source")
    val out = Curation.mixtureTemperature(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (rootA, rootB) = (math.sqrt(0.8), math.sqrt(0.2))
    val tot = rootA + rootB
    assert(out("a") == ((16L, 0.8, rootA / tot)))
    assert(out("b") == ((4L, 0.2, rootB / tot)))
    assert(out("c")._1 == 0L && out("c")._3 == 0.0)
    // smoothing never inverts the order, only flattens it
    assert(out("a")._3 < 0.8 && out("b")._3 > 0.2)
    assert(out("a")._3 > out("b")._3)
    // shuffle-order independence: the normalizer is an ordered fold
    val rep = Curation.mixtureTemperature(d.repartition(7)).collect()
      .map(r => (r.getString(0), r.getDouble(4))).toMap
    assert(rep("a") == out("a")._3 && rep("b") == out("b")._3)
  }

  test("softDedupTokens: 1/n micro-token weights, cross-source families") {
    // family "a b c" has 3 members across two sources
    val d = Seq(
      (1L, "a b c", "s1"), (2L, "a b c", "s1"), (3L, "x y", "s1"),
      (4L, "a b c", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Curation.softDedupTokens(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    // s1: raw 3+3+2=8; eff = 2*(3e6/3) + 2e6 = 4e6; ratio 0.5
    assert(out("s1") == ((3L, 2L, 8L, 4000000L, 0.5)))
    // s2: its one doc sits in a family of 3 -> eff = 1e6
    assert(out("s2") == ((1L, 1L, 3L, 1000000L, 1000000.0 / 3000000.0)))
  }
}
