package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NearDup.bandTuningReport (q177): the md5 MinHash family matches an
  * independent JVM recompute, candidate sets are nested across the
  * refining band configs (so counts/recall are monotone in
  * rows-per-band), and the report's ratios are consistent with its
  * counts.
  */
class BandTuningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus: DataFrame = {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    t.documents.select(col("doc_id"), col("text"))
      .unionByName(t.documents.select((col("doc_id") + 1000000L).as("doc_id"),
        substring(col("text"), lit(1),
          greatest(length(col("text")) - 10, lit(1))).as("text")))
      .localCheckpoint()
  }

  test("md5-derived signature matches an independent JVM recompute") {
    val row = NearDup.shingleSets(corpus, "doc_id", "text", 3)
      .filter(col("__id") === 0L)
      .select(col("__sh"), NearDup.minhashMd5Sig(col("__sh"), 4).as("__sig"))
      .as[(Seq[String], Seq[Long])].collect().head
    val (shingles, sig) = row
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(g: String): Long = {
      val hex = md.digest(g.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val p = NearDup.MinHashP
    val ref = (0 until 4).map { i =>
      val a = (i.toLong * 2654435761L) % 1000003L + 1L
      val b = (i.toLong * 40503L + 1L) % p
      shingles.map(g => (a * h(g) + b) % p).min
    }
    assert(sig === ref)
  }

  test("report: nested candidates, monotone recall, consistent ratios") {
    val rep = NearDup.bandTuningReport(corpus, "doc_id", "text")
      .as[(Int, Int, Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    val (c82, c44, c28) = (rep((8, 2)), rep((4, 4)), rep((2, 8)))
    // a 4-row band match implies both 2-row halves match, so the
    // candidate sets refine: (2,8) ⊆ (4,4) ⊆ (8,2)
    assert(c28._1 <= c44._1 && c44._1 <= c82._1, "candidate nesting")
    assert(c28._2 <= c44._2 && c44._2 <= c82._2, "true-candidate nesting")
    assert(c82._3 === c44._3 && c44._3 === c28._3, "one shared truth count")
    assert(c82._3 > 0, "planted twins guarantee truth pairs")
    rep.values.foreach { case (nc, ntc, nt, recall, precision) =>
      assert(ntc <= math.min(nc, nt))
      def r9(x: Double) = BigDecimal(x)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(recall === r9(ntc.toDouble / nt))
      assert(precision === (if (nc == 0) 0.0 else r9(ntc.toDouble / nc)))
    }
    // the permissive end of the sweep must catch the planted twins well
    assert(c82._4 >= 0.9, s"(8,2) recall ${c82._4} unexpectedly low")
  }
}
