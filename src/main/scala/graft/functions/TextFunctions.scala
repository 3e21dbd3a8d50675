package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators. All pure
  * Column expressions (codegen'd, no UDFs) with exact DuckDB-SQL
  * equivalents so every downstream operator stays oracle-checkable.
  */
object TextFunctions {

  /** Lowercase, collapse non-alphanumerics to single spaces, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text (no empties) — the
    * [a-z0-9] runs of the lowercased text. One native byte pass
    * ([[Tokenize]]); the composed regexp_replace+split+filter chain
    * it replaced is replayed verbatim by every oracle's ToksSql and
    * pinned bit-equal in TokenizeSpec. */
  def tokens(c: Column): Column = call_function("graft_tokens", c)

  /** Distinct word n-gram shingles (space-joined) of the token array.
    * Empty when the doc has fewer than n tokens (Spark's `sequence`
    * would otherwise count DOWN for a negative span). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      call_function("graft_shingles", toks, lit(n)))
      .otherwise(array().cast("array<string>"))

  /** Language-ID stopword lists. Deliberately tiny n-gram heuristics —
    * the operator contract is determinism, not linguistic accuracy. */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "es" -> Seq("el", "los", "las", "y", "es", "no"),
    "fr" -> Seq("le", "la", "et", "les", "est", "pas"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo", "zai"))

  /** NULL-propagating array size: this session runs with the legacy
    * size(NULL) = -1 semantics, while every oracle's len(NULL) is
    * NULL — an unguarded size would emit -1 counts (which even satisfy
    * `< threshold` rules) for NULL-text rows. */
  def sizeOrNull(c: Column): Column = when(c.isNotNull, size(c))

  /** Count of tokens present in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t)))
  }

  /** Predicted language: lexicographically-first language with the
    * max stopword-hit score; 'unknown' when all scores are zero. */
  def langPred(scores: Map[String, Column]): Column = {
    val langs = scores.keys.toSeq.sorted
    val m = greatest(langs.map(scores): _*)
    langs.foldRight(lit("unknown")) { (l, acc) =>
      when(m > 0 && scores(l) === m, lit(l)).otherwise(acc)
    }
  }

  /** Deterministic 40-bit polynomial rolling hash of a string:
    * fold(h*31 + char) mod 2^40 — small enough to never overflow a
    * 64-bit accumulator, portable to any engine with a list fold
    * (the DuckDB oracles replay it with list_reduce over ascii()).
    * Dispatches to the native codegen'd
    * [[graft.functions.RollingHash]] expression (registered by
    * GraftSession) — the interpreted split→filter→per-char-lambda
    * fold computes the same value ~10× slower. */
  def rollingHash(c: Column): Column = call_function("graft_rolling_hash", c)
}
