package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: per-doc
  * match counts for email / phone / IPv4 patterns plus a redacted text
  * column with each match replaced by a typed placeholder. Pure
  * row-local regexp column expressions (codegen'd, no UDF) — linear
  * with the scan at any corpus size, full pushdown below it.
  *
  * Oracle-gated via [[plantPii]] (deterministic in-query PII planted
  * into the corpus, replayed verbatim in DuckDB) AND spec-gated
  * (PrivacySpec plants each PII class and asserts detection,
  * redaction and idempotence).
  */
object Privacy {

  /** Deterministic PII planting — the oracle fixture for the redaction
    * gate. The synthetic corpus contains no PII, so a DuckDB oracle on
    * raw documents would be an all-zeros gate that can't catch a
    * broken pattern. Every `every`-th doc gets one email, one phone
    * and one IPv4 appended, all derived from doc_id, mirrored
    * verbatim in the oracle SQL — the hash check then verifies real
    * match counts and real replacements, not zeros. The patterns
    * stay in the RE2 ∩ java.util.regex subset (character classes,
    * bounded repetition, non-capturing groups, ASCII \b — no
    * backrefs, no lookaround), so both engines agree match-for-match.
    * NULL text stays NULL (concat propagates, as does SQL ||). */
  /** Planting period shared with the oracle SQL. */
  val PlantEvery = 7

  def plantPii(docs: DataFrame, every: Int = PlantEvery): DataFrame = {
    require(every > 0)
    docs.withColumn("text",
      when(col("doc_id") % every === 0,
        concat(col("text"),
          lit(" Contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-867-5309 from 10."),
          (col("doc_id") % 250).cast("string"), lit(".0.1")))
        .otherwise(col("text")))
  }

  /** Deliberately conservative patterns: high-precision shapes (a
    * false redaction destroys training text; a rare miss is caught by
    * the next pipeline pass). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe =
    "(?:\\+?[0-9]{1,3}[-. (]{1,2})?[0-9]{3}[-. )]{1,2}[0-9]{3}[-. ][0-9]{4}"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  private val classes: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("phone", PhoneRe, "<PHONE>"),
    ("ip", Ipv4Re, "<IP>"))

  /** (doc_id, n_email, n_phone, n_ip, pii_total, redacted): match
    * counts per class and the text with every match replaced by its
    * placeholder. Redaction order is email → phone → ip so an email's
    * digits can't be re-matched as a phone fragment; placeholders
    * contain no redactable characters, so the operator is idempotent.
    * NULL text propagates NULL counts and NULL redaction. */
  def piiRedact(docs: DataFrame): DataFrame =
    piiRedactUnordered(docs).orderBy(col("doc_id"))

  /** [[piiRedact]] without the final sort — the row-local core is
    * stateless, so it runs unchanged over an unbounded stream
    * ([[graft.streaming.EventStream.piiRedactStream]]); batch callers
    * get the sorted report above. */
  def piiRedactUnordered(docs: DataFrame): DataFrame = {
    val counts = classes.map { case (name, re, _) =>
      regexp_count(col("text"), lit(re)).cast("long").as(s"n_$name")
    }
    val redacted = classes.foldLeft(col("text")) {
      case (acc, (_, re, tag)) => regexp_replace(acc, re, tag)
    }
    docs
      .select(Seq(col("doc_id")) ++ counts :+ redacted.as("redacted"): _*)
      .withColumn("pii_total",
        col("n_email") + col("n_phone") + col("n_ip"))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        col("pii_total"), col("redacted"))
  }

  /** k-anonymity audit over a set of quasi-identifier expressions:
    * one row per equivalence class (the distinct quasi-identifier
    * combination) with its size and whether it meets `k` — the
    * pre-release check that a "de-identified" extract can't be
    * re-identified by joining on the quasi-identifiers (classes
    * smaller than k pinpoint individuals). `quasi` is (output name →
    * expression) so callers generalize inline (bands, truncations)
    * and the report shows the GENERALIZED values it certifies. One
    * map-side-combining aggregate — group count is bounded by the
    * generalized domain, never the table; no distinct, no window. */
  def kAnonymity(df: DataFrame, quasi: Seq[(String, Column)],
                 k: Int): DataFrame = {
    require(quasi.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    val cols = quasi.map { case (n, c) => c.as(n) }
    df.select(cols: _*)
      .groupBy(quasi.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("anonymous", col("class_size") >= k)
      .orderBy(quasi.map(q => col(q._1)): _*)
  }

  /** l-diversity audit — the [[kAnonymity]] follow-up (Machanavajjhala
    * et al., ICDE'06): a k-anonymous class is still a disclosure if
    * everyone in it shares the same SENSITIVE value (the homogeneity
    * attack), so each quasi-identifier class must also carry at least
    * `l` distinct sensitive values. One aggregate at the class grain
    * (count + count-distinct over the same shuffle kAnonymity pays);
    * rows with a NULL sensitive value count toward class size but not
    * diversity — an absent value discloses nothing. */
  def lDiversity(df: DataFrame, quasi: Seq[(String, Column)],
                 sensitive: (String, Column), l: Int): DataFrame = {
    require(quasi.nonEmpty, "lDiversity needs at least one quasi-identifier")
    val cols = quasi.map { case (n, c) => c.as(n) } :+
      sensitive._2.as(sensitive._1)
    df.select(cols: _*)
      .groupBy(quasi.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitive._1)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
      .orderBy(quasi.map(q => col(q._1)): _*)
  }

  /** t-closeness audit — the [[lDiversity]] follow-up (Li et al.,
    * ICDE'07): a diverse class still leaks if its sensitive
    * DISTRIBUTION differs from the table's (skewness attack: "people
    * in this class are mostly in the top balance band"), so each
    * quasi-identifier class's distance to the global distribution
    * must stay ≤ t. For an ORDERED sensitive attribute the distance
    * is the Earth Mover's Distance with unit ground distance between
    * adjacent categories: t = Σᵢ|cumᵢ(p−q)| / (m−1) over the m
    * global bands.
    *
    * Exactness: the cumulative term is kept as the INTEGER numerator
    * `Σ(c·N − g·n)` (c = class-band count, g = global band count,
    * n = class size, N = table size) — order-independent under any
    * shuffle schedule; the single double division at the end is
    * correctly rounded in both engines. |cum| ≤ n·N, so the integer
    * path is exact below N·n ≈ 9·10¹⁸ — a ~3·10⁹-row table whose
    * largest class is the whole table; larger corpora would move the
    * numerator to per-class scaled fractions.
    *
    * Shape: one domain-bounded aggregate to the (class, band) grain,
    * a classes×bands grid (generalized-domain-sized, never
    * table-sized), a per-class window over the m bands, and a
    * grid-sized final aggregate. The global band frame and the 1-row
    * (N, m) frame ride broadcasts. */
  def tCloseness(df: DataFrame, quasi: Seq[(String, Column)],
                 sensitive: (String, Column), t: Double): DataFrame = {
    require(quasi.nonEmpty, "tCloseness needs at least one quasi-identifier")
    val qNames = quasi.map(_._1)
    val base = df.select(
      quasi.map { case (n, c) => c.as(n) } :+ sensitive._2.as("sens"): _*)
    val cb = base.groupBy((qNames :+ "sens").map(col): _*)
      .agg(count(lit(1)).as("c"))
    val cls = cb.groupBy(qNames.map(col): _*).agg(sum(col("c")).as("n"))
    val gb = cb.groupBy(col("sens")).agg(sum(col("c")).as("g"))
    val tot = gb.agg(sum(col("g")).as("nn"), count(lit(1)).as("m"))
    val grid = cls.crossJoin(broadcast(gb))
      .join(cb, qNames :+ "sens", "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
    val w = Window.partitionBy(qNames.map(col): _*).orderBy(col("sens"))
    grid
      .withColumn("cum_num",
        sum(col("c") * col("nn") - col("g") * col("n")).over(w))
      .groupBy((qNames :+ "n").map(col): _*)
      .agg(sum(abs(col("cum_num"))).as("s"),
        max(col("nn")).as("nn"), max(col("m")).as("m"))
      .select(qNames.map(col) ++ Seq(
        col("n").as("class_size"),
        (col("s").cast("double") /
          (col("n").cast("double") * col("nn") * (col("m") - 1)))
          .as("t_value")): _*)
      .withColumn("close", col("t_value") <= t)
      .orderBy(qNames.map(col): _*)
  }
}
