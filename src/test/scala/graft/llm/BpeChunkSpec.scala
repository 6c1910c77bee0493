package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins BpeChunker's greedy boundary rule against an independent
  * driver-side packer on hand-shaped documents — including the paths
  * the synthetic corpus never exercises (a single word costlier than
  * the whole budget; an exact-boundary fill; empty/whitespace docs) —
  * and the additivity invariant that justifies per-word billing: the
  * chunk costs of a document sum to the document's own model-token
  * count (merges never cross word boundaries).
  */
class BpeChunkSpec extends SparkSpec {
  import spark.implicits._

  private def wordCost(w: String): Long = {
    val df = Seq(w).toDF("text")
      .select(Bpe.tableTokenCount(spark, col("text")).as("c"))
    df.head().getLong(0)
  }

  /** Independent reference packer: the documented greedy rule. */
  private def refChunks(words: Seq[String], budget: Long): Seq[(Int, Int, Int, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
    var idx = 0; var start = 0; var nWords = 0; var cost = 0L
    for ((w, i) <- words.zipWithIndex) {
      val c = wordCost(w)
      if (nWords > 0 && cost + c > budget) {
        out += ((idx, start + 1, nWords, cost))
        idx += 1; start = i; nWords = 1; cost = c
      } else {
        if (nWords == 0) start = i
        nWords += 1; cost += c
      }
    }
    if (nWords > 0) out += ((idx, start + 1, nWords, cost))
    out.toSeq
  }

  private def run(docs: Seq[(Long, String)], budget: Long): Map[Long, Seq[(Int, Int, Int, Long)]] =
    BpeChunker.chunk(spark, docs.toDF("doc_id", "text"), "doc_id", "text", budget)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  test("greedy boundaries match the reference packer, incl. over-budget words") {
    // "the" costs 1 under the curated merges; craft an over-budget word
    // from rare chars (no merges fire -> cost = char count)
    val fat = "zqxjzqxjzqxj" // 12 chars, no curated merge applies
    assert(wordCost(fat) >= 4, "fat word should cost several tokens")
    val docs = Seq(
      1L -> "the the the the the the",       // fills then splits
      2L -> s"the $fat the",                 // over-budget word mid-doc
      3L -> fat,                             // single over-budget word
      4L -> "",                              // empty -> no chunks
      5L -> "   ",                           // whitespace-only -> none
      6L -> "scan sort table")
    val budget = 4L
    val got = run(docs, budget)
    for ((id, text) <- docs) {
      val words = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val want = refChunks(words, budget)
      assert(got.getOrElse(id, Nil) == want,
        s"doc $id: got ${got.getOrElse(id, Nil)} want $want")
    }
    // the over-budget word really does exceed the budget in its own chunk
    assert(got(3L).exists(_._4 > budget), "over-budget chunk not emitted")
  }

  test("chunk costs are additive: per-doc sum equals the document token count") {
    val docs = Seq(1L -> "the scan sort table can then sort the table again",
      2L -> "a b c d e f g h i j k l m n o p")
    val out = run(docs, budget = 3L)
    val df = docs.toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.tableTokenCount(spark, col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, chunks) <- out)
      assert(chunks.map(_._4).sum == df(id),
        s"doc $id: chunk costs ${chunks.map(_._4)} don't sum to ${df(id)}")
  }

  test("every word lands in exactly one chunk, in order, budget respected") {
    val docs = Seq(1L -> ("lorem ipsum dolor sit amet " * 20).trim)
    val out = run(docs, budget = 16L)(1L)
    val nWordsTotal = docs.head._2.split("\\s+").length
    assert(out.map(_._3).sum == nWordsTotal)
    assert(out.map(_._1) == out.indices.map(identity))
    // start positions chain: start(k+1) = start(k) + n_words(k)
    out.sliding(2).foreach {
      case Seq((_, s1, n1, _), (_, s2, _, _)) => assert(s2 == s1 + n1)
      case _ =>
    }
    // no chunk over budget unless it is a single word
    out.foreach { case (_, _, n, c) => assert(c <= 16L || n == 1) }
    assert(out.length > 1, "test doc should split into several chunks")
  }
}
