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
    // corpus under +100000*c copy offsets (c <= 9), so the soak's max
    // doc_id is maxBase + 900000 (~905000 in practice) — which sat
    // INSIDE the old [900000, 990000] offset band. Assert the
    // construction keeps it under the new 10^6 floor.
    val path = "/root/testdata/sf0.1/documents.parquet"
    if (new java.io.File("/root/testdata/sf0.1").exists) {
      val mx = spark.read.parquet(path)
        .agg(max(col("doc_id"))).collect().head.getLong(0)
      assert(mx + 900000L < 1000000L,
        s"sf0.1 max doc_id $mx + the soak's +900000 copy band reaches " +
          "the fresh-id floor — shrink the soak band or raise the floor")
    }
  }
}
