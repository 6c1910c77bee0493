package graft.llm

import graft.SparkSpec

/** Pins the scrub contract on hand-shaped rows: detection of each
  * PII class, the independent-count rule (a phone-like substring
  * inside an email counts for both), sequential redaction order, zero
  * false positives on clean text, and the boundary cases the corpus
  * plants never produce (adjacent PII, 4-octet lookalikes).
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Long, Long, String)] = {
    import org.apache.spark.sql.functions._
    val out = PiiScrub.scrub(rows.toDF("doc_id", "text"))
    // re-derive the redacted text for assertion readability
    val red = rows.toDF("doc_id", "text").select(col("doc_id"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        PiiScrub.EmailRe, "<EMAIL>"), PiiScrub.PhoneRe, "<PHONE>"),
        PiiScrub.IpRe, "<IP>").as("rt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), red(r.getLong(0))))).toMap
  }

  test("detects each class, leaves clean text alone") {
    val got = run(
      1L -> "write to jane_doe%x@sub.example.co.uk today",
      2L -> "call (555) 123-4567 or 555.123.4567",
      3L -> "hosts 192.168.0.1 and 8.8.8.8",
      4L -> "nothing here: 1234, v1.2.3, a@b (no tld), 12-34-56")
    assert(got(1L)._1 == 1 && got(1L)._4 == "write to <EMAIL> today")
    assert(got(2L)._2 == 2 && got(2L)._4 == "call <PHONE> or <PHONE>")
    assert(got(3L)._3 == 2 && got(3L)._4 == "hosts <IP> and <IP>")
    assert(got(4L) == ((0L, 0L, 0L, "nothing here: 1234, v1.2.3, a@b (no tld), 12-34-56")))
  }

  test("counts are independent; redaction is sequential email-first") {
    // the email's local part ends in a phone-shaped string: email
    // redaction consumes it, so the redacted text has no <PHONE>,
    // but the independent counts see both
    val got = run(10L -> "x 555-123-4567@mail.com y")
    assert(got(10L)._1 == 1, "email count")
    assert(got(10L)._2 == 1, "independent phone count")
    assert(got(10L)._4 == "x <EMAIL> y", "email redaction wins the overlap")
  }

  test("ipv4 lookalikes with >3 digits per octet don't match") {
    val got = run(20L -> "not an ip: 1234.5.6.7 but 1.2.3.4 is")
    assert(got(20L)._3 == 1)
    assert(got(20L)._4.contains("<IP> is"))
  }

  test("phone digit-boundary contract: longer digit runs excluded, adjacency kept") {
    // round-15 advice fix: the old unanchored pattern matched
    // '155-123-4567' inside '4155-123-4567' and partially redacted it;
    // the \b-anchored pattern must reject digit-flanked candidates
    // while keeping adjacent phones (a consuming (^|[^0-9]) guard
    // would eat the separator and miss the second one)
    val got = run(
      30L -> "ref 4155-123-4567 and 555-123-45678 stay",
      31L -> "555-123-4567 555-123-4567",
      32L -> "fax (555) 123-4567 end",
      33L -> "odd (555-123-4567 here")
    assert(got(30L)._2 == 0, "digit-flanked runs are not phones")
    assert(got(30L)._4 == "ref 4155-123-4567 and 555-123-45678 stay",
      "no partial redaction of digit runs")
    assert(got(31L)._2 == 2 && got(31L)._4 == "<PHONE> <PHONE>",
      "adjacent phones both detected and redacted")
    assert(got(32L)._2 == 1 && got(32L)._4 == "fax <PHONE> end")
    assert(got(33L)._2 == 1 && got(33L)._4 == "odd (<PHONE> here",
      "unbalanced paren left intact, digits redacted")
  }
}
