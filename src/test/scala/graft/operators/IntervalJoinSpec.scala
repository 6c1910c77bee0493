package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The binned overlap join must equal the brute-force cross-join
  * definition EXACTLY-ONCE (the first-shared-bin reporting trick must
  * neither duplicate nor drop), across bin boundaries, long-spanning
  * intervals, touching endpoints, and any binSize.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)]) =
    (for ((lid, l1, l2) <- ls; (rid, r1, r2) <- rs
          if l1 <= r2 && r1 <= l2) yield (lid, rid)).sorted

  private def run(ls: Seq[(Long, Long, Long)], rs: Seq[(Long, Long, Long)],
      bin: Long): Seq[(Long, Long)] =
    IntervalJoin.overlap(
        ls.toDF("lid", "ls", "le").repartition(5),
        rs.toDF("rid", "rs", "re").repartition(3),
        "ls", "le", "rs", "re", bin)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted

  test("random intervals equal brute force exactly-once, several bin sizes") {
    val rng = new scala.util.Random(31)
    val ls = (0 until 300).map { i =>
      val s = rng.nextInt(10000).toLong; (i.toLong, s, s + rng.nextInt(500))
    }
    val rs = (0 until 200).map { i =>
      val s = rng.nextInt(10000).toLong; (i.toLong, s, s + rng.nextInt(2000))
    }
    val want = brute(ls, rs)
    assert(want.nonEmpty)
    for (bin <- Seq(1L, 7L, 100L, 4096L, 1000000L))
      assert(run(ls, rs, bin) === want, s"binSize=$bin")
  }

  test("touching endpoints overlap (closed intervals); disjoint do not") {
    val ls = Seq((1L, 0L, 10L), (2L, 20L, 30L))
    val rs = Seq((10L, 10L, 15L), (20L, 31L, 40L))
    assert(run(ls, rs, 8L) === Seq((1L, 10L))) // end==start touches; 30<31 not
  }

  test("interval spanning many bins pairs once with each overlapper") {
    val ls = Seq((1L, 0L, 100000L)) // 100 bins of 1000
    val rs = (0 until 50).map(i => (i.toLong, i * 2000L, i * 2000L + 10L))
    assert(run(ls, rs, 1000L) === rs.map(r => (1L, r._1)).sorted)
  }

  test("invalid interval fails loudly, shared column names rejected") {
    val ok = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    intercept[Exception] {
      IntervalJoin.overlap(Seq((1L, 10L, 0L)).toDF("lid", "ls", "le"),
        Seq((2L, 0L, 5L)).toDF("rid", "rs", "re"),
        "ls", "le", "rs", "re", 10L).count()
    }
    intercept[IllegalArgumentException] {
      IntervalJoin.overlap(ok, ok, "ls", "le", "ls", "le", 10L)
    }
  }

  test("null bounds fail loudly instead of silently dropping the row") {
    val rs = Seq((2L, 0L, 5L)).toDF("rid", "rs", "re")
    for (bad <- Seq((java.lang.Long.valueOf(1L), null: java.lang.Long, java.lang.Long.valueOf(10L)),
                    (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(0L), null: java.lang.Long))) {
      val ls = Seq(bad).toDF("lid", "ls", "le")
      val e = intercept[Exception] {
        IntervalJoin.overlap(ls, rs, "ls", "le", "rs", "re", 10L).count()
      }
      assert(e.getMessage.contains("IntervalJoin") ||
        Option(e.getCause).exists(_.getMessage.contains("IntervalJoin")))
    }
  }
}
