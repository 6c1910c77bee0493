package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub pass every shared training
  * corpus runs before release: emails, NANP-style phone numbers, and
  * IPv4 literals are counted and replaced by typed placeholders.
  *
  * Patterns use only constructs whose semantics are IDENTICAL between
  * Java regex (Spark's engine) and RE2 (DuckDB's): character classes,
  * bounded repetition, non-capturing groups, word boundaries — no
  * lookaround, no backreferences (RE2 has neither). Counts are
  * measured INDEPENDENTLY on the original text (a documented
  * contract: a phone-looking substring inside an email counts for
  * both); redaction applies sequentially email → phone → ip.
  *
  * Scale shape: a zero-shuffle scan projection — regexp_count and
  * regexp_replace are per-row codegen'd expressions; at 100 TB this is
  * one embarrassingly parallel pass, the only acceptable shape for an
  * every-ingest scrub.
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Digit-boundary contract (round-15 advice fix): a phone must not
    * sit inside a longer digit run — '4155-123-4567' is NOT a phone
    * (the old unanchored pattern matched its tail and partially
    * redacted it). Anchoring uses ONLY zero-width `\b` (identical
    * ASCII semantics in Java regex and RE2; consuming guards like
    * `(^|[^0-9])` would eat the separator between ADJACENT phones and
    * desync counts from redaction), which forces two alternatives:
    * bare `ddd-ddd-dddd` gets `\b` on both ends (a neighboring digit
    * or word char kills the boundary), while the parenthesized form
    * anchors on the literal '(' itself (zero-width `\b` cannot sit
    * between two non-word chars) plus a trailing `\b`. Unbalanced
    * parens now redact only the digits ('(555-123-4567' →
    * '(<PHONE>'; the old pattern swallowed the stray paren), the
    * correct reading of the NANP format.
    */
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b|" +
    "\\([0-9]{3}\\)[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  val IpRe = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Per-document scrub report: (idCol, n_emails, n_phones, n_ips,
    * clean_len, clean_md5) — the md5 anchors the exact redacted text
    * cross-engine without shipping it.
    */
  def scrub(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")
    docs.select(col(idCol),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(t, lit(IpRe)).cast("long").as("n_ips"),
      length(redacted).cast("long").as("clean_len"),
      md5(redacted).as("clean_md5"))
  }
}
