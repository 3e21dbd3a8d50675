package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation: per-doc
  * match counts for email / phone / IPv4 patterns plus a redacted text
  * column with each match replaced by a typed placeholder. Pure
  * row-local regexp column expressions (codegen'd, no UDF) — linear
  * with the scan at any corpus size, full pushdown below it.
  *
  * Spec-gated rather than oracle-gated: the synthetic corpus contains
  * no PII, so a DuckDB oracle would be an all-zeros gate that can't
  * catch a broken pattern — PrivacySpec plants each PII class and
  * asserts detection, redaction and idempotence instead.
  */
object Privacy {

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
  def piiRedact(docs: DataFrame): DataFrame = {
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
      .orderBy(col("doc_id"))
  }
}
