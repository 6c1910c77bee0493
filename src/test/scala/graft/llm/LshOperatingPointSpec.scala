package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Governance pins for the lexical LSH family (round-16 verdict items
  * 5 and ADVICE 3):
  *
  *  - [[NearDup.TunedBandConfig]] must BE the q177 tuning-curve argmax
  *    on the tuning corpus at the oracle-checked SF — the pinned
  *    operating point is a conclusion of the curve, not a free
  *    constant (the q182 calibration-governance pattern).
  *  - The persisted q177/q179 truth-pair recipe (LSH at 48 hashes /
  *    16 bands + exact-Jaccard verify) must equal the EXACT all-pairs
  *    program at the SF where the oracle gate runs — q177/q179 treat
  *    the fixture as ground truth, so its completeness is asserted
  *    here rather than assumed from the ~2% per-pair LSH miss bound.
  */
class LshOperatingPointSpec extends SparkSpec {
  import spark.implicits._

  /** The q177 tuning corpus at the oracle-checked SF: documents plus
    * truncated near-dup twins (the lshCorpus / q85 plant).
    */
  private def tuningCorpus: DataFrame = {
    val d = graft.Tables(spark, "/root/testdata/sf0.01").documents
    d.select(col("doc_id"), col("text"))
      .unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
        substring(col("text"), lit(1),
          greatest(length(col("text")) - 10, lit(1))).as("text")))
  }

  test("TunedBandConfig is the q177 argmax (recall, precision, -cands)") {
    val rows = NearDup.bandTuningReport(tuningCorpus, "doc_id", "text")
      .collect()
    assert(rows.length === 3, "three graded configs")
    val best = rows.maxBy(r => (r.getAs[Double]("recall"),
      r.getAs[Double]("precision"), -r.getAs[Long]("n_candidates")))
    assert((best.getAs[Int]("bands"), best.getAs[Int]("rows_per_band")) ===
      NearDup.TunedBandConfig,
      s"pinned config drifted off the tuning-curve argmax:\n" +
        rows.map(_.toString).mkString("\n"))
  }

  test("persisted truth recipe ≡ exact all-pairs Jaccard at checked SF") {
    val corpus = tuningCorpus
    val viaLsh = NearDup.nearDupPairs(corpus, "doc_id", "text",
        threshold = 0.6, shingleN = 3, numHashes = 48, bands = 16)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    val exact = NearDup.prefixJaccardPairs(corpus, "doc_id", "text",
        threshold = 0.6, shingleN = 3)
      .select(col("id_a"), col("id_b"))
      .as[(Long, Long)].collect().toSet
    assert(viaLsh === exact,
      s"LSH-derived truth missed ${(exact -- viaLsh).size} exact pairs, " +
        s"invented ${(viaLsh -- exact).size}")
  }
}
