package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the fresh-id ingest convention the incremental-query family
  * (q68/q142/q152/q157/q160/q162) builds on: synthetic batch doc_ids
  * are corpus ids + offsets in [900000, 990000], and the q162 oracle
  * CUTS on `doc_id >= 950000` — both silently assume every corpus
  * doc_id stays BELOW 900000 (round-15 ADVICE). This spec makes the
  * ceiling explicit: if a driver testdata refresh ever exceeds it, the
  * offsets (and the q162 oracle threshold) must move together.
  */
class FreshIdContractSpec extends SparkSpec {

  test("corpus doc_ids stay below the 900000 fresh-id floor at every fixture SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val path = s"/root/testdata/$sf/documents.parquet"
      if (new java.io.File(s"/root/testdata/$sf").exists) {
        val mx = spark.read.parquet(path)
          .agg(max(col("doc_id"))).collect().head.getLong(0)
        assert(mx < 900000L,
          s"$sf max doc_id $mx collides with the fresh-id offset " +
            "convention (+900000..+990000) — move the offsets AND the " +
            "q162 oracle's doc_id >= 950000 batch cut together")
      }
    }
  }
}
