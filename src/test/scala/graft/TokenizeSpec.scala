package graft

import org.apache.spark.sql.functions._

/** graft_tokens must be BIT-equal to the composed
  * regexp_replace+split+filter chain it replaced — every oracle's
  * ToksSql replays the composed semantics, so a divergence here
  * hash-breaks the entire text stack (token counts, vocab, BPE,
  * chunking, every shingle-based dedup family). Same adversarial
  * inputs as QualityCountsSpec plus array-content equality. */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "The quick brown fox AND the lazy dog",
    "a1b2c3 ---- x;y;z 000",
    "  ,,!! ?? __ --  ",
    "",
    "ÀÉ the ß123 Über straße",
    "K elvin the",
    "İstanbul the",
    "a\nb\tc the\r\nof",
    "tab\tand space  and nbsp",
    "UPPER lower MiXeD 42x7"
  )

  test("native tokens equal the composed regex chain, in order") {
    val df = (cases.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (999L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val composed = filter(
      split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " "),
      t => t =!= "")
    val rows = df.select(col("doc_id"),
        call_function("graft_tokens", col("text")).as("got"),
        composed.as("want"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) && r.isNullAt(2), s"null mismatch: $r")
      else
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"doc ${r.getLong(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
    }
  }
}
