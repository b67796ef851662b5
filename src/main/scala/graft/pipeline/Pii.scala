package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection / redaction for training-data curation — the scrub pass
  * every web-scale corpus runs before tokenization (emails, phone
  * numbers, IP addresses → typed placeholder tokens).
  *
  * Pure `regexp_count` / `regexp_replace` column expressions: scan-
  * parallel, zero shuffles, whole-stage-codegen'd — the per-row cost is
  * the regex automaton, so a 100 TB scrub is one pass over the corpus
  * with no data movement at all.
  *
  * The patterns deliberately use only syntax with identical semantics in
  * Java regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
  * repetition, `\b` ASCII word boundaries — no alternation, no
  * backreferences, no lookaround — so detection counts and the redacted
  * text are engine-portable and the whole operator carries a full oracle.
  */
object Pii {

  /** Lower-cased email (the corpus is lower-cased upstream). */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** NANP 555-prefixed local number (the fictional test range). */
  val phoneRe = "\\b555-[0-9]{4}\\b"

  /** Dotted-quad IPv4 (syntactic — octet range not enforced, matching
    * the common pipeline scrubbers that over-redact rather than leak). */
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Per-class match counts over the ORIGINAL text. */
  def counts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(emailRe)).cast("long"),
    "n_phones" -> regexp_count(text, lit(phoneRe)).cast("long"),
    "n_ipv4"   -> regexp_count(text, lit(ipv4Re)).cast("long"))

  /** Redacted text: email → phone → ipv4, in that fixed order (emails can
    * embed digits; scrubbing them first keeps the classes disjoint). */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** Per-document signals + redacted-text pin: counts per PII class, the
    * redacted length, and a portable hash of the redacted text (so the
    * oracle checks the scrub output bit-exact, not just the counts). */
  def signals(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val cols = counts(text).map { case (n, c) => c.as(n) }
    df.select(
      (idCol.as("did") +: cols) :+
        length(scrub(text)).cast("long").as("n_chars_clean") :+
        Dedup.portableHash(scrub(text)).as("clean_h"): _*)
  }
}
