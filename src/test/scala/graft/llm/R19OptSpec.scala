package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the round-19 optimization reshapes:
  *  - nearDupPairs / cleanAgainst now build band rows from the SAME
  *    checkpointed distinct shingle sets the verify joins read
  *    (tokenize once); the claim they rest on is that MinHash over the
  *    raw shingle multiset equals MinHash over its distinct set.
  *  - foldedCentroids fails loudly on an empty centroid table instead
  *    of silently emitting cluster_id=NULL / keep=true (ADVICE r18).
  */
class R19OptSpec extends SparkSpec {
  import spark.implicits._

  test("band rows from distinct shingle sets equal bandTable over raw shingles") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
      (2L, "alpha beta gamma alpha beta gamma alpha beta gamma delta"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val raw = NearDup.bandTable(df, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, seed = 42L)
      .as[(Long, Int, Long)].collect().toSet
    val fromSets = NearDup.bandRowsOfSets(
        NearDup.shingleSets(df, "doc_id", "text", 3), 16, 8, 42L)
      .as[(Long, Int, Long)].collect().toSet
    assert(fromSets === raw)
  }

  test("semDedupClustered fails loudly on an empty centroid table") {
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq.empty[(Long, Seq[Double])].toDF("centroid_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.semDedupClustered(corpus, cents, tau = 0.9).collect()
    }
    assert(e.getMessage.contains("centroid table is empty"))
  }
}
