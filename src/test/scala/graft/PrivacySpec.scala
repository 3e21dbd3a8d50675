package graft

import org.apache.spark.sql.functions._
import graft.operators.{Privacy, TextAnalysis}

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("piiRedact counts and redacts each PII class") {
    val docs = Seq(
      (1L, "contact me at jane.doe+x@example.co.uk or on 555-123-4567"),
      (2L, "server 10.0.42.7 and 192.168.1.1 are internal"),
      (3L, "perfectly clean text with no identifiers at all"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Privacy.piiRedact(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1 && out(1L).getLong(2) == 1)
    assert(out(1L).getString(5).contains("<EMAIL>"))
    assert(out(1L).getString(5).contains("<PHONE>"))
    assert(!out(1L).getString(5).contains("example.co.uk"))
    assert(!out(1L).getString(5).contains("4567"))
    assert(out(2L).getLong(3) == 2)
    assert(!out(2L).getString(5).contains("10.0.42.7"))
    assert(out(3L).getLong(4) == 0)
    assert(out(3L).getString(5) == "perfectly clean text with no identifiers at all")
    assert(out(4L).isNullAt(4) && out(4L).isNullAt(5))
  }

  test("lDiversity flags homogeneous classes; NULL sensitive excluded") {
    // class (1,'A'): 3 rows but ONE distinct sensitive value -> not
    // diverse even though k-anonymous; class (2,'B'): 3 rows, 2
    // distinct + a NULL that counts to size but not diversity
    val df = Seq(
      (1, "A", Some(10)), (1, "A", Some(10)), (1, "A", Some(10)),
      (2, "B", Some(1)), (2, "B", Some(2)), (2, "B", None))
      .toDF("nk", "seg", "bal")
    val out = Privacy.lDiversity(df,
      Seq("nk" -> col("nk"), "seg" -> col("seg")),
      "bal" -> col("bal"), l = 2).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out((1, "A")) == ((3L, 1L, false)))
    assert(out((2, "B")) == ((3L, 2L, true)))
  }

  test("piiRedact is idempotent and emails never double-match as phones") {
    val docs = Seq((1L, "mail a123.4567890@host1234.com now")).toDF("doc_id", "text")
    val once = Privacy.piiRedact(docs).head()
    assert(once.getLong(1) == 1, once.toString)
    assert(once.getLong(2) == 0, "email digits must not re-match as phone")
    val twice = Privacy.piiRedact(
      Privacy.piiRedact(docs).select(col("doc_id"),
        col("redacted").as("text"))).head()
    assert(twice.getLong(4) == 0, "redacted text must contain no further PII")
    assert(twice.getString(5) == once.getString(5))
  }

  test("tfidf ranks a document's distinctive term first") {
    val docs = Seq(
      (1L, "shared shared shared zebra"),
      (2L, "shared shared common words"),
      (3L, "shared common words again"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, 2).collect()
      .map(r => (r.getLong(0), r.getInt(5)) -> (r.getString(1), r.getLong(2),
        r.getLong(3))).toMap
    // doc 1: 'zebra' df=1 → idf 3.0 beats 'shared' tf=3 idf=1 (3*1=3 tie)
    // → tie broken by term asc: shared before zebra at equal score
    val top1 = out((1L, 1))
    assert(Set("zebra", "shared")(top1._1))
    // doc 2: 'common' (df=2, tf=1 → 1.5) vs 'words' (1.5) vs shared (2·1)
    assert(out((2L, 1))._1 == "shared" && out((2L, 1))._2 == 2)
    // every doc emits exactly perDoc rows here
    assert(out.size == 6)
  }

  test("lmScore scores common-word docs above rare-word docs") {
    val docs = Seq(
      (1L, "the the the the"),        // most common token
      (2L, "qqq zzz vvv www"),        // singletons
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4)))
      .toMap
    assert(out(1L)._1 == 4 && out(1L)._2 == 16) // each 'the' contributes 4
    assert(out(2L)._2 == 4)                     // each singleton contributes 1
    assert(out(1L)._3 > out(2L)._3)
    assert(!out.contains(3L), "null-text docs drop out (no tokens)")
  }

  test("tCloseness computes the ordered EMD exactly") {
    import graft.operators.Privacy
    // global bands (0, 1) split 3:1; class A is all band-0
    // (p=(1,0) vs q=(.75,.25) → EMD .25), class B is 1:1
    // ((.5,.5) vs (.75,.25) → EMD .25)
    val df = Seq(("A", 0L), ("A", 0L), ("B", 0L), ("B", 1L))
      .toDF("grp", "band")
    val out = Privacy.tCloseness(df,
      Seq("grp" -> col("grp")), "band" -> col("band"), t = 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(("A", 2L, 0.25, true), ("B", 2L, 0.25, true)))
    val strict = Privacy.tCloseness(df,
      Seq("grp" -> col("grp")), "band" -> col("band"), t = 0.2)
      .collect().map(_.getBoolean(3))
    assert(strict.forall(_ == false))
  }
}
