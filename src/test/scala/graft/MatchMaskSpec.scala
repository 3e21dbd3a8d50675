package graft

import org.apache.spark.sql.functions._
import graft.functions.MatchMask
import graft.operators.Curation
import org.apache.spark.unsafe.types.UTF8String

class MatchMaskSpec extends SparkSpec {
  import spark.implicits._

  private def mask(text: String, pats: String*): Long =
    MatchMask(org.apache.spark.sql.catalyst.expressions.Literal.create(text),
      pats).run(UTF8String.fromString(text))

  test("matches overlapping and nested patterns like naive contains") {
    // the classic fixture: suffix links must fire she→he, hers→he
    assert(mask("ushers", "he", "she", "his", "hers") == 0x0bL)
    assert(mask("abcab", "ab", "abc", "bc", "c") == 0x0fL)
    assert(mask("xyz", "he", "she") == 0L)
  }

  test("agrees with naive contains on random small-alphabet strings") {
    val rnd = new scala.util.Random(42)
    val pats = Seq("ab", "aba", "bb", "aab", "b")
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(12))("ab" (rnd.nextInt(2))).mkString
      val expect = pats.zipWithIndex
        .collect { case (p, i) if s.contains(p) => 1L << i }.sum
      assert(mask(s, pats: _*) == expect, s"text=$s")
    }
  }

  test("non-ASCII text chars reset the automaton, never crash it") {
    assert(mask("aéab", "ab") == 1L)
    assert(mask("aéb", "ab") == 0L)   // é splits the would-be match
  }

  test("early exit: full mask short-circuits but stays correct") {
    val t = "ab" + ("x" * 1000)
    assert(mask(t, "a", "b") == 3L)
    assert(mask(t, "a", "b", "xx") == 7L)
  }

  test("SQL registration parses literals and rejects non-literals") {
    assert(spark.sql("SELECT graft_match_mask('xabcx', 'abc', 'zz')")
      .head().getLong(0) == 1L)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_match_mask('abc', upper('b'))").head()
    }
    assert(e.getMessage.contains("string literals"))
  }

  test("canaryScan derives count and first index from the mask") {
    val docs = Seq(
      (1L, "the red fox and a blue bird"),
      (2L, "nothing of note here"),
      (3L, "blue bird then red fox too")).toDF("doc_id", "text")
    val out = Curation.canaryScan(docs, Seq("red fox", "blue bird", "gone"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), if (r.isNullAt(3)) -1 else r.getInt(3)))
      .toMap
    assert(out(1L) == ((3L, 2, 0)))
    assert(out(2L) == ((0L, 0, -1)))  // no match → NULL first_idx
    assert(out(3L) == ((3L, 2, 0)))
  }
}
