package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).getAs[T]("v")

  test("tokens: whitespace split with empty-text guard") {
    assert(one[Int](TextOps.tokenCount(col("text")), "a  b\tc") === 3)
    assert(one[Int](TextOps.tokenCount(col("text")), "") === 0)
    assert(one[Int](TextOps.tokenCount(col("text")), "   ") === 0)
    assert(one[Int](TextOps.tokenCount(col("text")), " solo ") === 1)
    // Non-space leading whitespace: no phantom "" token (Spark's trim
    // strips only 0x20, so the old trim+split form returned ["","foo",
    // "bar"] here), and whitespace-only text is 0 tokens, not 1.
    assert(one[Seq[String]](TextOps.tokens(col("text")), "\tfoo bar") === Seq("foo", "bar"))
    assert(one[Int](TextOps.tokenCount(col("text")), "\n") === 0)
    assert(one[Int](TextOps.tokenCount(col("text")), "\t \n x") === 1)
  }

  test("bpeTokenCount: letter runs, digit runs, single punct") {
    // "abc12 de!" -> [abc][12][de][!] = 4
    assert(one[Int](TextOps.bpeTokenCount(col("text")), "abc12 de!") === 4)
    assert(one[Int](TextOps.bpeTokenCount(col("text")), "") === 0)
  }

  test("quality score: integer points, length band + stopwords + word length") {
    val good = (Seq.fill(10)("the quick brown") :+ "fox").mkString(" ") // 31 tokens, has 'the'
    assert(one[Int](TextOps.qualityScore(col("text")), good) === 10)
    assert(one[Int](TextOps.qualityScore(col("text")), "short text") === 3) // only word-len ok
  }

  test("langId: marker-word voting with en-priority tie-break") {
    assert(one[String](TextOps.langId(col("text")), "the cat and the dog") === "en")
    assert(one[String](TextOps.langId(col("text")), "der hund und die katze ist") === "de")
    assert(one[String](TextOps.langId(col("text")), "xyzzy plugh") === "und")
    // 'a' hits en list; 'y' hits es list — one each, en wins the tie
    assert(one[String](TextOps.langId(col("text")), "a y") === "en")
  }

  test("fingerprint: invariant to case, punctuation, extra whitespace") {
    val df = Seq((1L, "Hello,  World!"), (2L, "hello world"), (3L, "different"))
      .toDF("id", "text")
    val fps = df.select(col("id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("wordShingles + repetitionScore") {
    val sh = one[scala.collection.Seq[String]](TextOps.wordShingles(col("text"), 2), "a b c")
    assert(sh.toSeq === Seq("a b", "b c"))
    assert(one[scala.collection.Seq[String]](TextOps.wordShingles(col("text"), 5), "a b c").isEmpty)
    // "a b a b a" 2-grams: [a b, b a, a b, b a] -> 2 distinct / 4 = 0.5 rep
    assert(one[Double](TextOps.repetitionScore(col("text"), 2), "a b a b a") === 0.5)
    assert(one[Double](TextOps.repetitionScore(col("text"), 2), "x") === 0.0)
  }

  test("rollingFingerprint: deterministic, shingle-content keyed") {
    val a = one[Long](TextOps.rollingFingerprint(col("text")), "the quick brown fox jumps")
    val b = one[Long](TextOps.rollingFingerprint(col("text")), "the quick brown fox jumps")
    assert(a === b)
  }

  test("PII: counts find planted identifiers; redaction replaces all and only them") {
    val text = "write to alice.smith+x@corp-mail.co.uk or call 555-123-4567 " +
      "from host 192.168.0.1; plain words 123 stay"
    def cnt(p: (String, String)) = one[Int](TextOps.piiCount(col("text"), p._2), text)
    assert(cnt(TextOps.PiiPatterns(0)) === 1)
    assert(cnt(TextOps.PiiPatterns(1)) === 1)
    assert(cnt(TextOps.PiiPatterns(2)) === 1)
    val red = one[String](TextOps.piiRedact(col("text")), text)
    assert(red.contains("[EMAIL]") && red.contains("[PHONE]") && red.contains("[IPV4]"))
    assert(!red.contains("alice") && !red.contains("192.168"))
    assert(red.contains("plain words 123 stay"), s"over-redacted: $red")
    // Digit-boundary contract (shared with PiiScrub): a phone-shaped
    // tail inside a longer digit run is NOT a phone.
    val run = "order id 4155-123-4567 is not a phone"
    assert(one[Int](TextOps.piiCount(col("text"), TextOps.PiiPatterns(1)._2), run) === 0)
    assert(one[String](TextOps.piiRedact(col("text")), run) === run)
    // no PII -> text unchanged
    val clean = "nothing sensitive here at all"
    assert(one[String](TextOps.piiRedact(col("text")), clean) === clean)
  }

  test("winnowing: shared substring of length >= k+w-1 guarantees a shared fingerprint") {
    val k = 8; val w = 4
    def fps(text: String): Set[String] =
      Seq(text).toDF("text")
        .select(TextOps.winnowingFingerprints(col("text"), k, w).as("v"))
        .collect()(0).getSeq[String](0).toSet
    val shared = "a very distinctive copied passage sits here"
    val d1 = fps(s"completely unrelated preamble text then $shared and a tail")
    val d2 = fps(s"other document entirely $shared closing differently")
    val d3 = fps("nothing in common with the others at all whatsoever")
    assert(d1.intersect(d2).nonEmpty, "copied region must share a fingerprint")
    assert(d1.intersect(d3).isEmpty || d1.intersect(d3).size < d1.intersect(d2).size)
    // deterministic; short text -> no fingerprints
    assert(fps(shared) === fps(shared))
    assert(fps("tiny") === Set.empty)
  }

  test("chunkTokens: hand trace — overlap, short last chunk, empty doc omitted") {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens, size 3 step 2 -> 4 chunks
      (2L, "x"),             // single token -> one short chunk
      (3L, "   ")            // no tokens -> no chunks
    ).toDF("doc_id", "text")
    val got = TextOps.chunkTokens(docs, "doc_id", "text", size = 3, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(got === Seq(
      (1L, 0, 3, "a b c"),
      (1L, 1, 3, "c d e"),
      (1L, 2, 3, "e f g"),
      (1L, 3, 1, "g"),
      (2L, 0, 1, "x")))
    // chunks reassemble the doc: stride-step prefixes of consecutive
    // chunks concatenated = the token stream
    intercept[IllegalArgumentException] {
      TextOps.chunkTokens(docs, "doc_id", "text", size = 3, overlap = 3)
    }
  }
}
