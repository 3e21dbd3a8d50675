package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{NearDup, TextAnalysis, VectorSearch}

class TextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox JUMPS over the lazy dog!!", "en"),  // near-dup of 1
    (3L, "der hund und die katze und das pferd", "de"),
    (4L, "xy", "en"),                                             // < 3 tokens
    (5L, "completely different words entirely here today", "en")
  ).toDF("doc_id", "text", "lang")

  test("shingles: empty below n tokens, distinct, space-joined") {
    val sh = docs.select(col("doc_id"),
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(4L).isEmpty)
    assert(sh(1L).contains("the quick brown"))
    assert(sh(1L).length == 7)
  }

  test("span dedup finds maximal cross-doc repeated spans") {
    // spans: docs 1 and 2 share a 12-token span mid-text; docs 1 and 3
    // share a DIFFERENT 9-token span later; doc 4 is clean. Seeds are
    // 8-gram windows, so both spans exceed the detection floor.
    val spanA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val spanB = "one two three four five six seven eight nine"
    val sd = Seq(
      (1L, s"unique1 prefix $spanA filler middle $spanB unique1 tail"),
      (2L, s"unique2 start $spanA unique2 end"),
      (3L, s"unique3 lead mid $spanB unique3 close"),
      (4L, "entirely fresh words nowhere else repeated in any document at all")
    ).toDF("doc_id", "text")
    val out = NearDup.spanDedup(sd, 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // doc 1: spanA at tokens [2, 14), spanB at [16, 25)
    // doc 2: spanA at [2, 14); doc 3: spanB at [3, 12); doc 4: none
    assert(out.toSeq == Seq(
      (1L, 2, 14, 12), (1L, 16, 25, 9),
      (2L, 2, 14, 12), (3L, 3, 12, 9)))
  }

  test("span strip removes all flagged spans and accounts for them") {
    val spanA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val sd = Seq(
      (1L, s"unique1 prefix $spanA unique1 tail"),
      (2L, s"unique2 start $spanA unique2 end"),
      (3L, "entirely fresh words nowhere else repeated in any document at all")
    ).toDF("doc_id", "text")
    val out = NearDup.spanStrip(sd, 8).collect()
      .map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    // doc 1: 16 tokens, spanA (12) stripped → 4 survive
    assert(out(1L) == ((1, 16, 12, "unique1 prefix unique1 tail")))
    assert(out(2L) == ((1, 16, 12, "unique2 start unique2 end")))
    assert(out(3L)._1 == 0 && out(3L)._3 == 0 &&
      out(3L)._4 == "entirely fresh words nowhere else repeated in any document at all")
  }

  test("seed novelty scores corpus-unique seed fraction") {
    val spanA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val sd = Seq(
      (1L, s"unique1 prefix $spanA unique1 tail"),   // 16 toks → 9 seeds
      (2L, s"unique2 start $spanA unique2 end"),
      (3L, "short doc"),                              // below seed floor
      (4L, "entirely fresh words nowhere else repeated in any document at all")
    ).toDF("doc_id", "text")
    val out = NearDup.seedNovelty(sd, 8).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    // doc 1: 9 seeds, 5 fully inside the shared span are non-unique
    assert(out(1L)._1 == 9L && out(1L)._2 == 4L)
    assert(out(1L)._3.get == 4.0 / 9.0)
    assert(out(3L) == ((0L, 0L, None)))   // no seeds → NULL novelty
    assert(out(4L)._3.get == 1.0)         // all seeds unique
  }

  test("span dedup merges overlapping seeds and respects the seed floor") {
    // a 7-token shared run is below the 8-token seed floor → invisible
    val short = Seq(
      (1L, "p q r s t u v w x y z zz"),
      (2L, "aa bb p q r s t u v cc")  // shares only 7 tokens (p..v)
    ).toDF("doc_id", "text")
    assert(NearDup.spanDedup(short, 8).collect().isEmpty)
  }

  test("compression ratio: deterministic, repetitive < prose, raw len exact") {
    val cr = Seq(
      (1L, "a" * 2000),                                   // degenerate repeat
      (2L, "The quick brown fox jumps over the lazy dog. " * 44), // templated
      (3L, (1 to 300).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")), // high-entropy prose-ish
      (4L, ""),                                           // empty → null ratio
      (5L, "héllo wörld ünïcode")                         // multibyte raw_len
    ).toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(cr).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // raw_len is UTF-8 BYTES, not chars
    assert(out(5L)._1 == "héllo wörld ünïcode".getBytes("UTF-8").length)
    assert(out(1L)._1 == 2000)
    // deflate output is non-empty even for empty input; ratio guards /0
    assert(out(4L)._1 == 0 && out(4L)._3.isEmpty)
    // ordering: pure repeat ≪ templated ≪ high-entropy
    assert(out(1L)._3.get < out(2L)._3.get)
    assert(out(2L)._3.get < out(3L)._3.get)
    assert(out(1L)._3.get < 0.05 && out(3L)._3.get > 0.3)
    // determinism across runs (fixed level, one whole-buffer pass)
    val again = TextAnalysis.compressionRatio(cr).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(again == out.view.mapValues(_._2).toMap)
  }

  test("language id picks the max-stopword language") {
    val lid = TextAnalysis.languageId(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(lid(1L) == "en")
    assert(lid(3L) == "de")
    assert(lid(4L) == "unknown")
  }

  test("exact dedup groups identical normalized text") {
    val same = Seq((1L, "Hello, World!"), (2L, "hello world"), (3L, "other")).toDF("doc_id", "text")
    val d = TextAnalysis.exactDedup(same)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(d(1L) == ((1L, 0)))
    assert(d(2L) == ((1L, 1)))  // normalized-equal → dup of 1
    assert(d(3L) == ((3L, 0)))
  }

  test("jaccard pairs finds the planted near-dup and nothing else") {
    val p = NearDup.jaccardPairs(docs, 3, 0.3).collect()
    assert(p.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(p.head.getDouble(2) > 0.9)
  }

  test("inverted index: row-local tf, df floor, best-first postings") {
    val df = Seq(
      (1L, "a a a b"),
      (2L, "a b b"),
      (3L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(df, minDf = 2, k = 2).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out("a") == ((2L, 4L, "1:3,2:1")))       // tf desc
    assert(out("b") == ((3L, 4L, "2:2,1:1")))       // k=2 cuts doc 3
    assert(!out.contains("c"))                      // df 1 < minDf
  }

  test("dedup sweep reports pair/drop decay across the threshold ladder") {
    // a==b exactly (4 shared shingles, j=1); c shares 2 of a's 4
    // shingles (j = 2/(4+4-2) = 1/3) — qualifies at 300, not 500
    val tri = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "w1 w2 w3 w4 x y")).toDF("doc_id", "text")
    val out = NearDup.dedupSweep(tri, 3, Seq(300, 500, 2000)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(300) == ((3L, 2L))) // (1,2) (1,3) (2,3); d2 ∈ {2,3}
    assert(out(500) == ((1L, 1L))) // only the exact pair survives
    assert(!out.contains(2000))    // unreachable threshold → no row
  }

  test("minhash dedup clusters the near-dup pair, leaves rest alone") {
    val m = NearDup.minhashDedup(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(2L) == 1L)
    assert(m(1L) == 1L)
    assert(m(3L) == 3L && m(5L) == 5L)
  }

  test("simhash: near-identical docs get close fingerprints") {
    val s = NearDup.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(1L), s(2L)) <= 6)         // near-dups
    assert(hamming(s(1L), s(5L)) > hamming(s(1L), s(2L)))
  }

  test("cosine: identical vectors similarity 1, orthogonal 0") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val p = VectorSearch.cosineNearDup(vecs, 0.99).collect()
    assert(p.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(math.abs(p.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("trainCentroids converges to the cluster means") {
    // two tight clusters around (1,0) and (0,1); seeds one vector in each
    val vecs = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.9f, 0.05f)),
      (10L, Array(0.1f, 1.0f)), (11L, Array(0.0f, 1.0f)), (12L, Array(0.05f, 0.9f))
    ).toDF("vec_id", "embedding")
    val seeds = vecs.where(col("vec_id").isin(1L, 10L))
    val trained = VectorSearch.trainCentroids(vecs, seeds, 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(trained.size == 2)
    val c1 = trained(1L)
    assert(math.abs(c1.head - (1.0f + 1.0f + 0.9f) / 3) < 1e-6)
    assert(math.abs(c1(1) - (0.1f + 0.0f + 0.05f) / 3) < 1e-6)
  }

  test("probeCost attributes per-query scan cost across probe depths") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.9f, 0.05f)),
      (10L, Array(0.1f, 1.0f)), (11L, Array(0.0f, 1.0f)), (12L, Array(0.05f, 0.9f))
    ).toDF("vec_id", "embedding")
    val seeds = vecs.where(col("vec_id").isin(1L, 10L))
    val out = VectorSearch.probeCost(vecs, seeds, col("vec_id") === 1L)
      .collect()
    assert(out.length == 2)
    // rank 1 probes the query's own cluster (3 vectors = half the
    // corpus); rank 2 adds the far cluster (all 6 scanned)
    assert(out(0).getInt(1) == 1 && out(0).getLong(2) == 1L)
    assert(out(0).getLong(3) == 3L && out(0).getLong(4) == 3L)
    assert(out(0).getDouble(5) == 0.5)
    assert(out(1).getInt(1) == 2 && out(1).getLong(2) == 10L)
    assert(out(1).getLong(3) == 3L && out(1).getLong(4) == 6L)
    assert(out(1).getDouble(5) == 1.0)
  }

  test("brute-force topk ranks by cosine desc") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val r = VectorSearch.bruteForceTopK(vecs, vecs.where(col("vec_id") === 1), 2)
      .collect().map(r => r.getInt(2) -> r.getLong(1)).toMap
    assert(r(1) == 2L)  // most aligned
    assert(r(2) == 4L)
  }
  test("qualityFilter: every drop rule fires on its crafted document") {
    val stops = Seq("the", "a", "and", "of", "to", "is")
    val longOk = (1 to 15).map(i => s"${stops(i % 6)} word$i").mkString(" ") + "."
    val dupLines = (1 to 12).map(_ => "the same sentence again and so").mkString(". ") +
      ". " + (1 to 12).map(i => s"unique tail $i").mkString(" ")
    val repBigrams = "the of " * 40 + (1 to 10).map(i => s"w$i").mkString(" ")
    val noStops = (1 to 30).map(i => s"zebra$i").mkString(" ")
    val cases = Seq(
      (1L, longOk), (2L, "too short"), (3L, dupLines),
      (4L, repBigrams), (5L, noStops))
      .toDF("doc_id", "text")
      .unionAll(Seq(6L).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    val out = TextAnalysis.qualityFilter(cases)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "ok")
    assert(out(2L) == "too_short")
    assert(out(3L) == "dup_lines")
    assert(out(4L) == "repetitive_bigrams")
    assert(out(5L) == "no_stopwords")
    assert(out(6L) == "invalid_text")
  }

  test("qualityFilter v2: gopher shape rules fire on crafted documents") {
    // every doc passes ALL earlier rules (>=20 tokens, no dup lines,
    // distinct bigrams, has a stopword) so the NEW rule is the first
    // failure — and the 'ok' doc passes the new rules too
    val longWords = "the " + (1 to 24).map(i => s"elephantine$i").mkString(" ")
    val symbols = "the " + (1 to 24).map(i => s"cat$i").mkString(" # ") + " # # #"
    val bullets = (1 to 7).map(i => s"- the w${i}abc x${i}def z${i}ghi").mkString("\n")
    val ellipsis = "the aaa bbb ccc ddd eee fff...\n" +
      "the ggg hhh iii jjj kkk lll\nthe mmm nnn ooo ppp qqq rrr"
    val okDoc = "the " + (1 to 24).map(i => s"dog$i").mkString(" ")
    val cases = Seq(
      (1L, longWords), (2L, symbols), (3L, bullets), (4L, ellipsis), (5L, okDoc))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.qualityFilter(cases).collect()
      .map(r => r.getLong(0) -> r).toMap
    val out = rows.map { case (k, r) => k -> r.getString(2) }
    assert(out(1L) == "word_length", rows(1L).toString)
    assert(out(2L) == "symbol_heavy", rows(2L).toString)
    assert(out(3L) == "bullet_lines", rows(3L).toString)
    assert(out(4L) == "ellipsis_lines", rows(4L).toString)
    assert(out(5L) == "ok", rows(5L).toString)
    // signal values, not just verdicts: 27 '#'/'...' marks over 25
    // tokens; 7 of 7 bullet lines; 1 of 3 ellipsis lines
    assert(rows(2L).getDouble(8) > 0.1)
    assert(rows(3L).getDouble(9) == 1.0)
    assert(math.abs(rows(4L).getDouble(10) - 1.0 / 3) < 1e-9)
  }

  test("searchTopK ranks rare-term hits above common-term hits") {
    import graft.operators.TextAnalysis
    // 'rare' appears in 1 of 4 docs, 'common' in 3; tf equal → the
    // rare-term doc outscores the common-term docs (idf 4 vs 4/3)
    val df = Seq(
      (1L, "rare alpha beta"), (2L, "common alpha beta"),
      (3L, "common beta gamma"), (4L, "common gamma delta"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.searchTopK(df, Seq("rare", "common"), 10)
      .collect()
    assert(out.head.getLong(0) == 1L, "rare-term doc ranks first")
    assert(out.head.getDouble(3) == 4.0)
    assert(out.length == 4)
    assert(out(1).getDouble(3) == 4.0 / 3.0)
    // doc_id tiebreak among the equal-scored common docs
    assert(out.drop(1).map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    // k truncates
    assert(TextAnalysis.searchTopK(df, Seq("common"), 2).count() == 2)
    // multi-term docs sum matched-term weights only
    val both = TextAnalysis.searchTopK(
      df.unionAll(Seq((5L, "rare common")).toDF("doc_id", "text")),
      Seq("rare", "common"), 1).collect()
    assert(both.head.getLong(0) == 5L && both.head.getLong(1) == 2L)
  }

  test("exactDedupBest keeps the cleanest copy, not the lowest id") {
    import graft.operators.TextAnalysis
    // doc 2 normalizes identically to doc 1 but is cleaner raw text
    // (no punctuation noise -> higher alpha_ratio/quality), so it wins
    // the group despite the higher id; doc 3 is its own group
    val df = Seq(
      (1L, "the cat!!! sat??? on... the mat!!!"),
      (2L, "the cat sat on the mat"),
      (3L, "something else entirely"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.exactDedupBest(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == out(2L).getString(1), "same fingerprint")
    assert(out(1L).getLong(3) == 2L && out(1L).getInt(4) == 1,
      "noisy copy marked dup of the clean one")
    assert(out(2L).getLong(3) == 2L && out(2L).getInt(4) == 0)
    assert(out(3L).getInt(4) == 0)
  }

  test("unicodeNormalize unifies composed and decomposed forms") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "caf\u00e9"),        // composed: already NFC
      (2L, "cafe\u0301"),      // decomposed: changes under NFC
      (3L, "plain"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unicodeNormalize(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 0 && out(2L).getInt(1) == 1)
    // decomposed is 5 code points before, 4 after; fingerprints agree
    assert(out(2L).getLong(2) == 5L && out(2L).getLong(3) == 4L)
    assert(out(1L).getString(4) == out(2L).getString(4),
      "composed and decomposed must share the normalized fingerprint")
    assert(out(3L).getInt(1) == 0)
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(4))
  }

  test("minhashRecall: identical docs found by both legs; bounds hold") {
    import graft.operators.NearDup
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "entirely different words about completely other things here"))
      .toDF("doc_id", "text")
    val r = NearDup.minhashRecall(df).collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    // empty corpus: zero counts, NULL ratios (never a division error)
    val e = NearDup.minhashRecall(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L)
    assert(e.isNullAt(3) && e.isNullAt(4))
  }

  test("bpePairs counts adjacent pairs; short and NULL docs contribute none") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairs(df, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a b", 3L, 2L), ("b a", 1L, 1L)))
  }

  test("cleanText strips urls/tags, collapses whitespace, idempotent") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "go to https://a.io/x?z=1 now <b>bold</b>  and\t\ndone"),
      (2L, "plain text untouched"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.cleanText(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1L && out(1L).getLong(2) == 2L)
    assert(out(1L).getString(5) == "go to now bold and done")
    assert(out(1L).getLong(4) == out(1L).getString(5).length.toLong)
    assert(out(2L).getString(5) == "plain text untouched")
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(5), "NULL propagates")
    // idempotent: cleaning already-clean text changes nothing
    val again = TextAnalysis.cleanText(
      Seq((1L, out(1L).getString(5))).toDF("doc_id", "text")).collect()(0)
    assert(again.getString(5) == out(1L).getString(5))
    assert(again.getLong(1) == 0L && again.getLong(2) == 0L)
  }

  test("langIdEval builds the confusion matrix with per-class shares") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "the cat and the dog is a pet", "en"),   // correct en
      (2L, "le chat est la et pas le chien", "fr"), // correct fr
      (3L, "zqx wvu ppo", "en"))                    // no stopwords -> unknown
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langIdEval(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("en", "en")) == ((1L, 0.5)))
    assert(out(("en", "unknown")) == ((1L, 0.5)))
    assert(out(("fr", "fr")) == ((1L, 1.0)))
    assert(out.size == 3)
  }

  test("bpeTrain learns the exact merge sequence and stops when dry") {
    // vocab: aaab x1, ab x2. Round 1: (a,b) w=3 beats (a,a) w=2.
    // Round 2: tie at w=1 -> lexicographic (a,a) wins. Round 3 merges
    // the last pair; rounds 4-5 have nothing left -> 3 rows only.
    val df = Seq((1L, "aaab"), (2L, "ab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(df, nMerges = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (0, "a", "b", "ab", 3L),
      (1, "a", "a", "aa", 1L),
      (2, "aa", "ab", "aaab", 1L)))
  }

  test("bpeApply reproduces training-time segmentation on the fixture") {
    // merges learned above: (a,b)->ab, (a,a)->aa, (aa,ab)->aaab.
    // "aaab" folds a,a,a,b -> a,a,ab -> aa,ab -> aaab (1 symbol);
    // "ab" -> ab (1 symbol per token)
    val df = Seq((1L, "aaab"), (2L, "ab ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, nMerges = 5).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = TextAnalysis.bpeApply(df, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 1L, 1L, 1.0), (2L, 2L, 2L, 1.0)))
    // an untrained word stays at character grain
    val out2 = TextAnalysis.bpeApply(
      Seq((3L, "xyz")).toDF("doc_id", "text"), merges).collect()
    assert(out2.head.getLong(2) == 3L)
  }

  test("sourceVocabOverlap: pairwise vocab Jaccard, zero-overlap pairs absent") {
    val df = Seq(
      (1L, "a b c", "s1"), (2L, "b c d", "s2"), (3L, "x", "s3"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceVocabOverlap(df).collect()
    assert(out.length == 1) // s3 shares nothing with anyone
    val r = out.head
    assert(r.getString(0) == "s1" && r.getString(1) == "s2")
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L && r.getLong(4) == 2L)
    assert(r.getDouble(5) == 0.5)
  }

  test("sourceKl: hand-checked divergence, residual bucket engages") {
    val df = Seq(
      (1L, "aa aa bb", "s1"), (2L, "bb bb cc", "s2"))
      .toDF("doc_id", "text", "source")
    // corpus: aa 2, bb 3, cc 1 (tot 6); s1: aa 2/3, bb 1/3
    val out = TextAnalysis.sourceKl(df, 100).collect()
      .map(r => r.getString(0) -> r).toMap
    val klA = 2.0 / 3 * math.log((2.0 / 3) / (2.0 / 6)) +
      1.0 / 3 * math.log((1.0 / 3) / (3.0 / 6))
    val klB = 2.0 / 3 * math.log((2.0 / 3) / (3.0 / 6)) +
      1.0 / 3 * math.log((1.0 / 3) / (1.0 / 6))
    assert(out("s1").getLong(2) == 3L && out("s2").getLong(2) == 3L)
    assert(math.abs(out("s1").getDouble(3) - klA) < 1e-12)
    assert(math.abs(out("s2").getDouble(3) - klB) < 1e-12)
    // topTerms=1 keeps only bb; everything else folds into __other__
    val b = TextAnalysis.sourceKl(df, 1).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(b("s1").getLong(1) == 2L, "bb + __other__")
    val klA1 = 1.0 / 3 * math.log((1.0 / 3) / (3.0 / 6)) +
      2.0 / 3 * math.log((2.0 / 3) / (3.0 / 6))
    assert(math.abs(b("s1").getDouble(3) - klA1) < 1e-12)
  }

  test("bigramLmScore: integer conditional contributions, hand-checked") {
    // corpus bigrams: "a b", "b c" (doc 1), "a c" (doc 2);
    // first-token counts: a→2, b→1. Scores (micro-probability):
    // "a b" = 10⁶·1 div 2 = 500000, "b c" = 10⁶, "a c" = 500000
    val df = Seq((1L, "a b c"), (2L, "a c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the single-token doc 3 has no bigrams and no row
    assert(out.toSeq == Seq(
      (1L, 2L, 1500000L, 0.75),
      (2L, 1L, 500000L, 0.5)))
  }

  test("bigramLmScore separates in-order text from shuffled words") {
    // same WORDS, different transitions: the repeated in-order docs
    // share every bigram (high conditional score); the scrambled doc's
    // transitions are unique (low score). Unigram lmScore cannot tell
    // these apart — that is the point of the second order.
    val inOrder = "the quick brown fox jumps over the lazy dog"
    val df = Seq((1L, inOrder), (2L, inOrder), (3L, inOrder),
      (4L, "dog the over quick lazy brown the jumps fox"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(4L) < out(1L) / 2)
  }

  test("searchEval ranks past non-relevant high scorers") {
    import spark.implicits._
    // query {a, b}: only doc 2 contains both, but docs 1 and 4 score
    // higher on single-term tf — hand-computed BM25 order is 1, 4, 2,
    // so the first relevant doc sits at rank 3 and misses the top-2
    val docs = Seq(
      (1L, "a a a a"),
      (2L, "a b f f f f f f f f f f"),
      (3L, "f f g g"),
      (4L, "b b b")).toDF("doc_id", "text")
    val out = TextAnalysis.searchEval(docs,
      Seq("ab" -> Seq("a", "b"), "none" -> Seq("zzz")), k = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("ab") == ((1L, 3L, 1.0 / 3.0, 0.0)))
    // a query with no relevant docs masks rank to NULL and rr to 0
    assert(out("none") == ((0L, -1L, 0.0, 0.0)))
  }

  test("searchNdcg penalizes the buried high-grade doc") {
    import spark.implicits._
    // same corpus as the searchEval case: BM25 order 1, 4, 2 but the
    // grade-2 doc is 2 — hand-computed DCG/IDCG at k=3:
    // DCG = 1/log2(2) + 1/log2(3) + 2/log2(4), IDCG = 2 + 1/log2(3) + 1/2
    val docs = Seq(
      (1L, "a a a a"),
      (2L, "a b f f f f f f f f f f"),
      (3L, "f f g g"),
      (4L, "b b b")).toDF("doc_id", "text")
    val out = TextAnalysis.searchNdcg(docs, Seq("ab" -> Seq("a", "b")), k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val l3 = math.log(3) / math.log(2)
    val dcg = 1.0 + 1.0 / l3 + 2.0 / 2.0
    val idcg = 2.0 + 1.0 / l3 + 1.0 / 2.0
    assert(out.length == 1 && out(0)._1 == 3L)
    assert(math.abs(out(0)._2 - dcg) < 1e-12)
    assert(math.abs(out(0)._3 - idcg) < 1e-12)
    assert(math.abs(out(0)._4 - dcg / idcg) < 1e-12 && out(0)._4 < 0.85)
  }

  test("heapsFit: pure-linear vocab growth fits beta=1, lnK=0, r2=1") {
    // doc i contributes exactly one NEW word and one token: V(T) = T,
    // so the ln-ln OLS must land exactly on beta=1, lnK=0, r2=1.
    // Dense ids 1..10 on a 10-cell grid -> one doc per checkpoint.
    val docs = (1L to 10L).map(i => (i, s"w$i")).toDF("doc_id", "text")
    val out = TextAnalysis.heapsFit(docs, checkpoints = 10).collect()
    assert(out.length == 10)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1)            // checkpoint
      assert(r.getLong(1) == i + 1)            // cum_tokens
      assert(r.getLong(2) == i + 1)            // cum_vocab
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-12, "beta")
      assert(math.abs(r.getDouble(4)) < 1e-12, "lnK")
      assert(math.abs(r.getDouble(5) - 1.0) < 1e-12, "r2")
    }
  }

  test("heapsFit: repeated-vocab corpus flattens beta toward 0") {
    // every doc repeats the same 3 words: vocab saturates at bucket 1
    val docs = (1L to 10L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.heapsFit(docs, checkpoints = 5).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(2)).toSeq == Seq.fill(5)(3L), "vocab flat at 3")
    // flat series: slope 0 up to IEEE rounding of the moment sums
    assert(math.abs(out.head.getDouble(3)) < 1e-12, "beta ~0 for a flat series")
  }

  test("qualityTrend: rising quality across ingestion order -> positive slope") {
    // later docs are longer with stopwords -> higher composite quality;
    // constant-quality control must fit slope 0 exactly
    val rising = (1L to 12L).map { i =>
      val words = (1 to (i.toInt * 8)).map(j => if (j % 2 == 0) "the" else s"w$j")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.qualityTrend(rising, buckets = 4).collect()
    assert(out.length == 4)
    assert(out.head.getDouble(3) > 0, "slope positive on rising quality")
    val means = out.map(_.getDouble(2)).toSeq
    assert(means == means.sorted, "bucket means rise monotonically")
    val flat = (1L to 12L).map(i => (i, "the quick brown fox the lazy dog"))
      .toDF("doc_id", "text")
    val f = TextAnalysis.qualityTrend(flat, buckets = 4).collect()
    assert(math.abs(f.head.getDouble(3)) < 1e-9,
      "identical quality -> slope ~0")
  }

  test("hardNegatives: collided-but-below-threshold pairs, disjoint from dups") {
    // docs 1,2: identical (J=1 -> near-dup, NEVER a hard negative);
    // docs 3,4: share a long prefix, distinct suffixes -> J ≈ 0.45,
    // high band-collision probability at J≈0.45 with 16 r=2 bands
    // (deterministic given the fixed minhash coefficients)
    val common = (1 to 22).map(i => s"c$i").mkString(" ")
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, s"$common x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"),
      (4L, s"$common y1 y2 y3 y4 y5 y6 y7 y8 y9 y10 y11 y12"))
      .toDF("doc_id", "text")
    val hard = NearDup.hardNegatives(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val dups = NearDup.minhashPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups == Set((1L, 2L)), "identical pair is a dup, not a negative")
    assert(hard.keySet.intersect(dups).isEmpty, "complement partition")
    assert(hard.contains((3L, 4L)), "planted near-miss pair mined")
    assert(hard((3L, 4L)) > 0.3 && hard((3L, 4L)) < 0.5,
      "hardness score is the exact jaccard")
    // pre-verify cap: with preCap=1 only the TOP band-collision
    // candidate per anchor is exact-verified. Anchor 1's top candidate
    // is its identical twin (collides in all 16 bands) which verifies
    // as a dup -> anchor 1 yields nothing; anchor 3's only candidate
    // is the planted near-miss -> still mined. The cap can only
    // shrink the default result, never add to it.
    val capped = NearDup.hardNegatives(df, preCap = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(hard.keySet), "preCap only shrinks")
    assert(capped.contains((3L, 4L)), "sole candidate survives preCap=1")
    val perAnchorVerified = NearDup.hardNegatives(df, preCap = 1).collect()
      .groupBy(_.getLong(0)).values.map(_.length)
    assert(perAnchorVerified.forall(_ <= 1), "preCap bounds per-anchor output")
  }

  test("fertilityByLanguage: per-language totals and guarded ratios") {
    // doc 1: english (stopwords the/and), 6 words; doc 2: german;
    // doc 3: no stopword hits -> unknown
    val d = Seq(
      (1L, "the cat and the dog runs"),
      (2L, "der hund und die katze hier"),
      (3L, "zz9 qq7 xx1")).toDF("doc_id", "text")
    val out = TextAnalysis.fertilityByLanguage(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    assert(out.keySet == Set("en", "de", "unknown"))
    assert(out("en")._1 == 1L && out("en")._2 == 6L)
    assert(out("en")._3 == 6L && out("en")._4 == 1.0,
      "clean words: regex tokens == word tokens -> fertility 1")
    assert(out("unknown")._3 == 6L,
      "alnum-mixed junk splits into letter+digit runs: fertility 2")
    assert(out("unknown")._4 == 2.0)
  }

  test("dupSourceMatrix: near-dup pairs land in their source cells") {
    // docs 1~2 near-dup across srcA/srcB; 3~4 near-dup within srcC;
    // 5 is unrelated -> cells (A,B)=1 and (C,C)=1, shares 0.5 each
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today", "srcA"),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "srcB"),
      (3L, "entirely different words fill this other document here", "srcC"),
      (4L, "entirely different words fill this other document there", "srcC"),
      (5L, "nothing shared with anything else at all whatsoever", "srcD")
    ).toDF("doc_id", "text", "source")
    val out = NearDup.dupSourceMatrix(d, 3, 0.3).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keySet == Set(("srcA", "srcB"), ("srcC", "srcC")))
    assert(out(("srcA", "srcB")) == ((1L, 2L, 0.5)))
    assert(out(("srcC", "srcC")) == ((1L, 2L, 0.5)))
  }

  test("dupAuc: U-statistic with midrank ties, NULL scores excluded") {
    // s1: docs 1/2 identical low-quality pair (2 is the dup copy),
    // docs 3/4 unique high-quality. The one positive ties its own
    // canonical (identical text = identical score) and sits below
    // both uniques: U = 0 strict + 0.5 tie -> auc = 0.5/3 = 1/6.
    // s2: no dups -> NULL auc; the empty doc's NULL score is excluded
    // so n_uniq = 2, not 3.
    val d = Seq(
      (1L, "zz qq zz", "s1"),
      (2L, "zz qq zz", "s1"),
      (3L, "the quick brown fox and the lazy dog is here today", "s1"),
      (4L, "a stitch in time saves nine and the rest is history", "s1"),
      (5L, "completely unrelated words occupy this document space", "s2"),
      (6L, "and another set of the finest filler words is present", "s2"),
      (7L, "", "s2")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.dupAuc(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out.keySet == Set("s1", "s2"))
    assert(out("s1")._1 == 1L && out("s1")._2 == 3L)
    assert(math.abs(out("s1")._3.get - 1.0 / 6.0) < 1e-15,
      "one tied pair of three gets half credit")
    assert(out("s2") == ((0L, 2L, None)),
      "dup-free source: NULL auc, empty doc excluded")
  }

  test("lexicalDiversity: TTR, Guiraud R and hapax share per source") {
    val d = Seq(
      (1L, "a a b", "s1"),      // 3 tokens, 2 types, 1 hapax
      (2L, "c c c", "s2"),      // 3 tokens, 1 type, 0 hapax
      (3L, "", "s3"))           // zero tokens: source absent
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.lexicalDiversity(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(out.keySet == Set("s1", "s2"))
    assert(out("s1") == ((3L, 2L, 1L, 2.0 / 3,
      2.0 / math.sqrt(3.0), 0.5)))
    assert(out("s2") == ((3L, 1L, 0L, 1.0 / 3,
      1.0 / math.sqrt(3.0), 0.0)))
  }

  test("tokenEntropy: micro-nat quantized per-doc H, exact source mean") {
    val d = Seq(
      (1L, "a a b b", "s1"),   // H = ln4 - 4ln2/4 = ln2
      (2L, "c c c", "s1"))     // H = 0 (single-type doc)
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenEntropy(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    val hq = math.floor(math.log(2.0) * 1e6 + 0.5) // 693147 micro-nats
    assert(out("s1") == ((2L, hq / 2.0 / 1e6, 0.0, hq / 1e6)))
  }

  test("pmiBigrams: equal-rational pairs share one micro-nat score") {
    val d = Seq(
      (1L, "x y", "s"), (2L, "x y", "s"), (3L, "x y", "s"),
      (4L, "x z x z x", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.pmiBigrams(d, minCount = 2, topN = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    // unigrams x=6 y=3 z=2, N=11, P=7; all three pairs reduce to the
    // SAME rational 363/126 = 242/84 -> identical correctly-rounded
    // double -> identical micro-nat score; tie-break is (t1, t2)
    val exp = math.floor(
      math.log(363.0 / 126.0) * 1e6 + 0.5).toLong
    assert(out.map(_._1).toSeq == Seq(("x", "y"), ("x", "z"), ("z", "x")))
    assert(out.toMap == Map(
      ("x", "y") -> ((3L, 6L, 3L, exp)),
      ("x", "z") -> ((2L, 6L, 2L, exp)),
      ("z", "x") -> ((2L, 2L, 6L, exp))))
  }

  test("zipfBySource: perfect power law fits alpha=1, r2=1") {
    // a two-point fit is exact by construction: slope through
    // (ln1, ln6) and (ln2, ln2) is -ln3/ln2, r2 = 1
    val d = Seq(
      (1L, "a a a a b b", "z"),
      (2L, "a a", "z"))            // totals: a=6, b=2
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.zipfBySource(d, topK = 10).collect()
    val r = out.head
    // ranks: a(6)=1, b(2)=2 -> slope = (ln2-ln6)/(ln2-ln1) = -ln3/ln2
    val alpha = math.log(3.0) / math.log(2.0)
    assert(r.getString(0) == "z" && r.getLong(1) == 2L &&
      r.getLong(2) == 2L)
    assert(math.abs(r.getDouble(3) - alpha) < 1e-12)
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  test("prefixTemplates: shared first-k intro groups, short docs kept") {
    val d = Seq(
      (1L, "alpha beta gamma delta one", "s1"),
      (2L, "alpha beta gamma delta two", "s2"),   // same 4-prefix
      (3L, "alpha beta", "s1"),                   // short: own prefix
      (4L, "totally different text here", "s1"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.prefixTemplates(d, k = 4, minDocs = 2,
      topN = 10).collect()
    assert(out.length == 1)
    val r = out.head
    // (n_docs, n_sources, total_tokens, example_doc)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 2L, 10L, 1L)))
  }

  test("charProfile: exact class counts, uppercase counts as alpha") {
    val d = Seq((1L, "Ab1 c!", "s1")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.charProfile(d).collect().head
    // total 6 = 3 alpha + 1 digit + 1 space + 1 other
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) == ((1L, 6L, 3L, 1L, 1L, 1L)))
    assert(r.getDouble(7) == 0.5 && r.getDouble(8) == 1.0 / 6 &&
      r.getDouble(9) == 1.0 / 6)
  }

  test("tokenLengths: clamped grid with cumulative share") {
    val d = Seq((1L, "a bb ccc", "s"),
      (2L, "dddddddddddddddddddd", "s"))  // 20 chars -> 16+ bucket
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenLengths(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(out == Map(
      1L -> ((1L, 0.25, 0.25)), 2L -> ((1L, 0.25, 0.5)),
      3L -> ((1L, 0.25, 0.75)), 16L -> ((1L, 0.25, 1.0))))
  }

  test("dupClusterHist: families >=2 on the magnitude grid") {
    val d = (1L to 12L).map(i => (i, "big family")) ++     // size 12
      Seq((20L, "pair a"), (21L, "pair A!"),               // size 2
        (22L, "pair b"), (23L, "pair b"),                  // size 2
        (30L, "solo doc"))                                 // excluded
    val out = TextAnalysis.dupClusterHist(
      d.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == Map(
      1L -> ((2L, 4L, 2L, 2L, 2L)),
      2L -> ((1L, 12L, 11L, 12L, 12L))))
  }

  test("dedupSavings: token mass of non-survivors, cross-source") {
    val d = Seq(
      (1L, "a b c", "s1"),
      (2L, "a b c!!", "s1"),          // same fingerprint: dup
      (3L, "unique words here", "s1"),
      (4L, "A  B c", "s2"))           // cross-source copy of d1
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.dedupSavings(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out == Map(
      "s1" -> ((3L, 1L, 9L, 3L, 3.0 / 9)),
      "s2" -> ((1L, 1L, 3L, 3L, 1.0))))
  }

  test("readabilityBands: fixed-shape Flesch banding incl. unscorable") {
    val d = Seq(
      (1L, "The cat sat.", "s1"),     // 3w/1s/3syl -> 119.2: easy
      (2L, "onomatopoeia audiovisual aeiou", "s1"), // 3w/1s/10syl -> -78
      (3L, "", "s1"))                 // zero words -> unscorable
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.readabilityBands(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("s1", "easy") -> ((1L, 1.0 / 3)),
      ("s1", "very_difficult") -> ((1L, 1.0 / 3)),
      ("s1", "unscorable") -> ((1L, 1.0 / 3))))
  }

  test("oovRate: top-N cut with term tie-break, token and type shares") {
    // corpus counts: aa=3, bb=1, cc=1 -> top-2 is {aa, bb} (tie on 1
    // breaks to the lexically smaller bb)
    val d = Seq((1L, "s1", "aa aa bb"), (2L, "s2", "aa cc"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.oovRate(d, 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(out("s1") == ((3L, 0L, 0.0, 2L, 0L, 0.0)))
    assert(out("s2") == ((2L, 1L, 0.5, 2L, 1L, 0.5)))
  }

  test("ngramCoverage: checkpoint reads the cumulative head mass") {
    // bigrams of "a b a b c": "a b" x2, "b a", "b c" -> total 4;
    // top-1 covers 2/4, top-2 covers 3/4 ("b a" beats "b c" on tie)
    val d = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramCoverage(d, Seq(1, 2)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(1L) == ((1L, 2L, 4L, 0.5)))
    assert(out(2L) == ((2L, 3L, 4L, 0.75)))
  }

  test("hammingHist: grid mass equals the pair frame, shares sum to 1") {
    val pairs = NearDup.simhashPairs(docs).count()
    val hist = NearDup.hammingHist(docs).collect()
    assert(pairs > 0 && hist.map(_.getLong(1)).sum == pairs)
    assert(hist.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 3))
    assert(math.abs(hist.map(_.getDouble(2)).sum - 1.0) < 1e-12)
  }

  test("lengthBands: exact grid interpolation per source") {
    val d = Seq((1L, "s1", 10L), (2L, "s1", 10L), (3L, "s1", 20L),
      (4L, "s1", 30L)).toDF("doc_id", "source", "n_chars")
    val r = TextAnalysis.lengthBands(d).collect().head
    // p95 rank 0.95·3 = 2.849999… (0.95 is not dyadic); the expected
    // value mirrors the engines' shared interpolation arithmetic
    val p95 = 20.0 + (0.95 * 3 - 2.0) * 10.0
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6)) ==
      (("s1", 4L, 17.5, 10.0, 15.0, 22.5, p95)))
  }

  test("shingleStats: df histogram with the in-plan derived cap") {
    // shingles: "a b c" in docs 1+2 (df 2), "b c d"/"b c e"/"x y z"
    // df 1 -> one digit bucket: 4 shingles, postings 5, pair volume 1;
    // cumulative volume 1 <= budget so the cap floors at DfCapFloor
    val d = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val r = NearDup.shingleStats(d).collect()
    assert(r.length == 1)
    assert((r.head.getLong(0), r.head.getLong(1), r.head.getLong(2),
      r.head.getLong(3), r.head.getLong(4), r.head.getLong(5),
      r.head.getLong(6)) ==
      ((1L, 4L, 1L, 2L, 5L, 1L, NearDup.DfCapFloor.toLong)))
  }

  test("lengthOutliers: 3-sigma cross-multiplied cut, zero-variance safe") {
    // s1: ten docs of 10 chars + one of 1000 -> dev^2 = 9900^2 =
    // 98 010 000 > 9*(11*1001000 - 1100^2) = 88 209 000: one outlier.
    // s2: constant lengths -> sigma 0, strict compare keeps 0 outliers.
    val d = ((1 to 10).map(i => (i.toLong, "s1", 10L)) :+
      (11L, "s1", 1000L)) ++ Seq((12L, "s2", 50L), (13L, "s2", 50L))
    val out = TextAnalysis.lengthOutliers(
      d.toDF("doc_id", "source", "n_chars")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(out("s1") == ((11L, 1L, 1.0 / 11, 100.0, 1000L)))
    assert(out("s2") == ((2L, 0L, 0.0, 50.0, 50L)))
  }

  test("qualityNormalize: equal-population source bands, NULLs excluded") {
    // 20 scoreable docs with strictly increasing quality (longer text,
    // same stopword mix) + one empty doc that must fall out
    val rows = (1 to 20).map { i =>
      (i.toLong, Seq.fill(i)("the quick fox").mkString(" "), "s1")
    } :+ (21L, "", "s1")
    val d = rows.toDF("doc_id", "text", "source")
    val out = TextAnalysis.qualityNormalize(d, deciles = 10).collect()
    assert(out.length == 10, "one row per non-empty decile")
    assert(out.map(_.getLong(2)).forall(_ == 2L), "20 docs / 10 bands")
    // bands tile the score line in order: lo <= hi within a band,
    // and the next band starts at or above this band's hi
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= a.getDouble(4))
      assert(b.getDouble(3) >= a.getDouble(4))
    }
    assert(out.map(_.getDouble(5)).toSeq ==
      (1 to 10).map(i => (i - 0.5) / 10.0))
  }

  test("trendingTerms: per-bucket charts, prev ranks, lexicographic ties") {
    val d = Seq(
      (0L, "apple apple banana"), (1L, "apple cherry"),
      (2L, "banana banana cherry"), (3L, "banana date"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.trendingTerms(d, buckets = 2, topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3),
          if (r.isNullAt(4)) null else r.getInt(4),
          if (r.isNullAt(5)) null else r.getInt(5)))).toMap
    // bucket 1: apple 3, banana/cherry tie 1 -> banana wins rank 2
    assert(out((1L, "apple")) == ((3L, 1, null, null)))
    assert(out((1L, "banana")) == ((1L, 2, null, null)))
    // bucket 2: banana 3 (charted at 2 before -> delta +1), cherry new
    assert(out((2L, "banana")) == ((3L, 1, 2, 1)))
    assert(out((2L, "cherry")) == ((1L, 2, null, null)))
    assert(out.size == 4)
  }

  test("trendingTerms: topk tau-prune equals the naive per-bucket window") {
    import org.apache.spark.sql.expressions.Window
    // adversarial count ties at the cut boundary across many terms
    val d = (0L until 120L).map(i =>
      (i, (0 to (i % 7).toInt).map(j => s"t${(i + j) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val fast = TextAnalysis.trendingTerms(d, buckets = 3, topK = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    val idr = d.agg(min(col("doc_id")), max(col("doc_id"))).head
    val (lo, span) = (idr.getLong(0), idr.getLong(1) - idr.getLong(0) + 1)
    val naive = d.select(
        (expr(s"((doc_id - ${lo}L) * 3L) div ${span}L") + 1L).as("bucket"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("bucket", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("bucket"))
        .orderBy(col("cnt").desc, col("term"))))
      .where(col("rnk") <= 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(fast == naive)
  }

  test("trendingTerms: empty corpus yields an empty chart, not a throw") {
    val d = spark.emptyDataFrame
      .select(lit(0L).as("doc_id"), lit("").as("text"))
      .where(lit(false))
    val out = TextAnalysis.trendingTerms(d, buckets = 2, topK = 2)
    assert(out.columns.toSeq == Seq(
      "bucket", "term", "cnt", "rnk", "prev_rnk", "rank_delta"))
    assert(out.count() == 0L)
  }
}
