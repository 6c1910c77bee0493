package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The segment-blocked join must equal brute-force levenshtein ≤ k
  * (pigeonhole completeness), including substitutions, insert/delete
  * shifts (position window), k boundary cases, and the fixed-length
  * contract.
  */
class EditDistanceJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pad(s: String, len: Int): String =
    (s + " " * len).substring(0, len)

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0
      })
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for ((ia, sa) <- rows; (ib, sb) <- rows if ia < ib;
          d = lev(sa, sb) if d <= k) yield (ia, ib, d)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int, len: Int) =
    EditDistanceJoin.selfJoin(rows.toDF("id", "s").repartition(5), "id", "s", k, len)
      .as[(Long, Long, Int)].collect().toSet

  test("random mutated strings equal brute force, k = 1 and 2") {
    val rng = new scala.util.Random(41)
    val len = 24
    val base = (0 until 40).map(_ =>
      (0 until len).map(_ => ('a' + rng.nextInt(4)).toChar).mkString)
    // plant mutations: substitutions, one insert+truncate, one delete+pad
    val rows = base.zipWithIndex.flatMap { case (s, i) =>
      val sub = s.updated(rng.nextInt(len), 'z')
      val ins = pad(s.substring(0, 5) + "q" + s.substring(5), len)
      val del = pad(s.substring(0, 7) + s.substring(8), len)
      Seq((i * 10L, s), (i * 10L + 1, sub), (i * 10L + 2, ins),
        (i * 10L + 3, del))
    }
    for (k <- Seq(1, 2))
      assert(run(rows, k, len) === brute(rows, k), s"k=$k")
  }

  test("identical strings pair at distance 0; beyond-k pairs are excluded") {
    val len = 12
    val rows = Seq((1L, pad("hello world", len)), (2L, pad("hello world", len)),
      (3L, pad("hello qorld", len)), (4L, pad("completely", len)))
    val got = run(rows, 1, len)
    assert(got === Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("length-contract violation fails loudly") {
    intercept[Exception] {
      run(Seq((1L, "short"), (2L, "also-short")), 1, 24)
    }
  }

  // shared-prefix corpus: every string opens with the same 8 chars, so
  // the prefix segment is one quadratic hot key for the primary join
  private def sharedPrefixRows(n: Int, len: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(97)
    (0 until n).flatMap { i =>
      val tail = (0 until len - 8).map(_ => ('a' + rng.nextInt(6)).toChar).mkString
      val s = "prefixxx" + tail
      val mut = s.updated(10 + rng.nextInt(len - 10), 'z')
      Seq((i * 2L, s), (i * 2L + 1, mut))
    }
  }

  test("hot-segment escalation: result identical to brute force and to the cold-only path") {
    val len = 24
    val rows = sharedPrefixRows(60, len)
    val df = rows.toDF("id", "s").repartition(5)
    val want = brute(rows, 2)
    val hotOn = EditDistanceJoin.selfJoin(df, "id", "s", 2, len, hotThreshold = 8L)
      .as[(Long, Long, Int)].collect().toSet
    val hotOff = EditDistanceJoin.selfJoin(df, "id", "s", 2, len, hotThreshold = Long.MaxValue)
      .as[(Long, Long, Int)].collect().toSet
    assert(hotOff === want)
    assert(hotOn === want)
  }

  test("hot-segment escalation: candidate rows collapse on the shared-prefix corpus") {
    val len = 24
    val df = sharedPrefixRows(60, len).toDF("id", "s").repartition(5)
    val naive = EditDistanceJoin.candidates(df, "id", "s", 2, len, Long.MaxValue).count()
    val refined = EditDistanceJoin.candidates(df, "id", "s", 2, len, 8L).count()
    // 120 strings sharing the prefix key → primary emits ~120²/2 rows
    // from it; the complement re-blocking keeps only genuinely close
    // pairs' witnesses
    assert(refined < naive / 3, s"refined=$refined naive=$naive")
  }
}
