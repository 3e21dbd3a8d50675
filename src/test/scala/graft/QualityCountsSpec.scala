package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** graft_quality_counts must be BIT-equal to the three-pass composed
  * form it replaced (tokens() size, stopwordHits, [^a-z]-strip
  * length) — the quality oracles replay the composed semantics, so
  * any divergence is a silent hash mismatch across the whole
  * curation family. Inputs cover the byte-vs-char hazards the
  * one-pass scan reasons about: multi-byte chars as separators,
  * Unicode lowercasing (Kelvin sign → ASCII k, Turkish İ), digit
  * tokens, stopwords embedded in longer runs, NULL and empty text. */
class QualityCountsSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "The quick brown fox AND the lazy dog",
    "the a and of to is",            // every token a stopword
    "the1 a2 and3",                  // digits extend runs past stopwords
    "  ,,!! ?? __ --  ",             // no tokens at all
    "",                              // empty text
    "ÀÉ the ß123 Über straße",       // multi-byte separators + ß (stays ß)
    "K elvin the",              // Kelvin sign lowercases to ASCII k
    "İstanbul the",             // Turkish İ lowercase is i + combining dot
    "a\nb\tc the\r\nof",             // whitespace variety
    "123 456 the789the the",
    "ThE oF aNd Is A tO"             // case folding on the stopwords
  )

  test("one-pass counts equal the composed three-pass form") {
    val df = (cases.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (999L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val qc = call_function("graft_quality_counts",
      (col("text") +: stopwords("en").map(lit)): _*)
    val rows = df.select(col("doc_id"),
        coalesce(element_at(qc, 1), lit(-1)).as("got_tok"),
        coalesce(element_at(qc, 2), lit(-1)).as("got_stop"),
        element_at(qc, 3).as("got_alpha"),
        size(tokens(col("text"))).as("want_tok"),
        stopwordHits(tokens(col("text")), stopwords("en")).as("want_stop"),
        length(regexp_replace(lower(col("text")), "[^a-z]", ""))
          .as("want_alpha"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(4),
        s"token_cnt doc ${r.getLong(0)}: $r")
      assert(r.getInt(2) == r.getInt(5),
        s"stop_hits doc ${r.getLong(0)}: $r")
      assert((r.isNullAt(3) && r.isNullAt(6)) ||
        r.getInt(3) == r.getInt(6), s"alpha doc ${r.getLong(0)}: $r")
    }
  }

  test("qualityFrame output is unchanged by the one-pass rewrite") {
    // the downstream contract: same schema, same composite score as
    // the composed form computes by hand on a known row
    val df = Seq((1L, "the quick brown fox is one of a kind", "s"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.qualityScore(df).collect().head
    val toks = 9
    assert(r.getAs[Int]("token_cnt") == toks)
    assert(r.getAs[Int]("stop_hits") == 4) // the, is, of, a
    val textLen = "the quick brown fox is one of a kind".length
    val alpha = "thequickbrownfoxisoneofakind".length
    assert(r.getAs[Double]("alpha_ratio") == alpha.toDouble / textLen)
    val score = math.min(1.0, toks / 100.0) *
      (0.5 + 0.5 * (4.0 / toks)) * (alpha.toDouble / textLen)
    assert(r.getAs[Double]("quality_score") == score)
  }
}
