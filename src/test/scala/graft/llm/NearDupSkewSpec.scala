package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The documented LSH skew guard, as a tested invariant instead of a
  * comment (NearDup scaladoc "Skew note"): a degenerate corpus of
  * thousands of IDENTICAL documents would put every doc in the same
  * LSH bucket and explode candidatePairs quadratically — exact dedup
  * FIRST (CorpusDedup stage 1 / Dedup.exactByHash) collapses each
  * exact-content class to one representative, so the LSH stage's
  * candidate count stays O(distinct content), not O(rows²).
  */
class NearDupSkewSpec extends SparkSpec {
  import spark.implicits._

  private val nIdentical = 10000

  test("exact-dedup-first keeps LSH candidates O(n) on a degenerate corpus") {
    // 10^4 byte-identical docs + a handful of distinct ones
    val identical = (0 until nIdentical).map(i =>
      (i.toLong, "the same exact document body repeated verbatim many times over"))
    val distinct = (0 until 20).map(i =>
      (nIdentical + i.toLong, s"a unique document number $i with its own words and shape $i"))
    val corpus = (identical ++ distinct).toDF("doc_id", "text")

    // the guard: stage-1 exact dedup first (CorpusDedup.clean's shape)
    val keepExact = corpus
      .select(col("doc_id"), md5(col("text")).as("__h"))
      .groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = corpus.join(keepExact, Seq("doc_id"), "left_semi")
    assert(deduped.count() === 21L, "one representative per exact class")

    // LSH candidates over the deduped set: bounded by distinct-content
    // pairs (21 docs -> at most 210), nowhere near the 5*10^7 pair
    // space the raw corpus would bucket into
    val candidates = NearDup.candidatePairs(deduped, "doc_id", "text",
      shingleN = 3, numHashes = 32, bands = 8, seed = 42L)
    val n = candidates.count()
    assert(n <= 210L, s"candidate count $n is not O(distinct docs)")

    // end-to-end: clean() on the degenerate corpus returns the same
    // kept set whether or not the duplicates are planted — the pipeline
    // never touches the quadratic pair space
    val kept = CorpusDedup.clean(corpus, "doc_id", "text").count()
    assert(kept >= 1L && kept <= 21L)
  }
}
