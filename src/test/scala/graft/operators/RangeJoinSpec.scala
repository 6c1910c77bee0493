package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** RangeJoin.pointInInterval: equivalence to the brute-force
  * inequality join, bin-width invariance, no duplicate pairs, and the
  * plan contract (hash join on the bin, no nested-loop join).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val rng = new scala.util.Random(11)
  private lazy val intervals = (1 to 120).map { i =>
    val s = rng.nextInt(5000).toLong
    (i.toLong, ts(s), ts(s + rng.nextInt(300).toLong))
  }.toDF("iv_id", "t_start", "t_end").cache()
  private lazy val points = (1 to 800)
    .map(i => (i.toLong, ts(rng.nextInt(5500).toLong)))
    .toDF("pt_id", "pt_ts").cache()

  private def pairsWith(binSecs: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(intervals, "t_start", "t_end",
        points, "pt_ts", binSecs * 1000000L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet

  test("matches the brute-force inequality join, exactly once per pair") {
    val got = RangeJoin.pointInInterval(intervals, "t_start", "t_end",
        points, "pt_ts", 60L * 1000000L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect()
    val want = intervals.join(points,
        col("pt_ts") >= col("t_start") && col("pt_ts") <= col("t_end"))
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(got.length === got.toSet.size, "no duplicate pairs")
    assert(got.toSet === want)
  }

  test("result is invariant to the bin width") {
    val base = pairsWith(60)
    assert(pairsWith(1) === base)
    assert(pairsWith(7) === base)
    assert(pairsWith(3600) === base)
  }

  test("inclusive bounds and degenerate intervals") {
    val iv = Seq((1L, ts(10), ts(20)), (2L, ts(30), ts(25)))
      .toDF("iv_id", "t_start", "t_end")
    val pt = Seq((1L, ts(10)), (2L, ts(20)), (3L, ts(15)), (4L, ts(21)),
      (5L, ts(27))).toDF("pt_id", "pt_ts")
    val got = RangeJoin.pointInInterval(iv, "t_start", "t_end", pt, "pt_ts",
        1000000L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (1L, 2L), (1L, 3L)))
  }

  test("plan: equi hash join on the bin, never a nested loop") {
    val out = RangeJoin.pointInInterval(intervals, "t_start", "t_end",
      points, "pt_ts", 60L * 1000000L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must stay an equi-join:\n$plan")
    assert(plan.contains("__bin"), s"join key must be the bin:\n$plan")
  }

  test("column collision is rejected") {
    val iv = Seq((1L, ts(1), ts(2))).toDF("id", "s", "e")
    val pt = Seq((1L, ts(1))).toDF("id", "t")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(iv, "s", "e", pt, "t", 1000000L)
    }
  }
}
