package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the fresh-id ingest convention the incremental-query family
  * (q68/q142/q152/q157/q160/q162) builds on: synthetic batch doc_ids
  * are corpus ids + offsets in [1000000, 1090000], and the q162 oracle
  * CUTS on `doc_id >= 1050000` — both silently assume every corpus
  * doc_id stays BELOW 1000000 (round-15 ADVICE established the
  * contract at 900000; round-17 ADVICE found the 10× soak's copy bands
  * reach ~905000, breaching it, so round 18 moved the whole offset
  * family to ≥ 10⁶). This spec makes the ceiling explicit: if a driver
  * testdata refresh ever exceeds it, the offsets (and the q162 oracle
  * threshold) must move together. The floor carries 10× headroom over
  * the soak band by construction.
  */
class FreshIdContractSpec extends SparkSpec {

  test("corpus doc_ids stay below the 10^6 fresh-id floor at every fixture SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val path = s"/root/testdata/$sf/documents.parquet"
      if (new java.io.File(s"/root/testdata/$sf").exists) {
        val mx = spark.read.parquet(path)
          .agg(max(col("doc_id"))).collect().head.getLong(0)
        assert(mx < 1000000L,
          s"$sf max doc_id $mx collides with the fresh-id offset " +
            "convention (+1000000..+1090000) — move the offsets AND the " +
            "q162 oracle's doc_id >= 1050000 batch cut together")
      }
    }
  }

  test("the 10x soak's copy bands stay below the fresh-id floor too") {
    // the round-17 ADVICE breach class: SoakGen replicates the sf0.1
    // corpus under +DocIdStep*c copy offsets (c < Copies), so the
    // soak's max doc_id is maxBase + (Copies-1)*DocIdStep (~905000 in
    // practice) — which sat INSIDE the old [900000, 990000] offset
    // band. The ceiling DERIVES from SoakGen's own constants (round-18
    // review: a hardcoded +900000 here would stay green if the soak
    // ever grew to 12 copies while the corpus re-breached).
    val maxOffset =
      (graft.tools.SoakGen.Copies - 1) * graft.tools.SoakGen.DocIdStep
    val path = "/root/testdata/sf0.1/documents.parquet"
    if (new java.io.File("/root/testdata/sf0.1").exists) {
      val mx = spark.read.parquet(path)
        .agg(max(col("doc_id"))).collect().head.getLong(0)
      assert(mx + maxOffset < 1000000L,
        s"sf0.1 max doc_id $mx + the soak's +$maxOffset copy band " +
          "reaches the fresh-id floor — shrink the soak band or raise " +
          "the floor")
    }
  }
}
