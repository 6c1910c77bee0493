package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TVD drift against hand-computable distributions: exact values on
  * known bins, the identical-distribution zero, the disjoint-support
  * one, the empty-side convention, and partitioning determinism.
  */
class FeatureDriftSpec extends SparkSpec {
  import spark.implicits._

  private def audit(train: Seq[(String, Double)], batch: Seq[(String, Double)],
                    w: Double = 10.0): Map[String, (Long, Long, Double)] =
    FeatureDrift.tvd(
        train.toDF("g", "v").repartition(5), batch.toDF("g", "v").repartition(3),
        Seq("g"), "v", w)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("exact TVD on known bins; identical distributions give 0") {
    // train a: bins 0->2, 1->2 ; batch a: bins 0->3, 1->1
    // TVD = 1/2 (|2/4-3/4| + |2/4-1/4|) = 1/4
    val got = audit(
      train = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 11.0, "a" -> 12.0,
        "b" -> 5.0, "b" -> 15.0),
      batch = Seq("a" -> 3.0, "a" -> 4.0, "a" -> 5.0, "a" -> 13.0,
        "b" -> 6.0, "b" -> 16.0))
    assert(got("a") == ((4L, 4L, 0.25)))
    assert(got("b") == ((2L, 2L, 0.0)), "identical dist must be 0")
  }

  test("disjoint support gives 1; empty side gives 1; unequal sizes exact") {
    val got = audit(
      train = Seq("a" -> 1.0, "a" -> 2.0, "c" -> 1.0),
      batch = Seq("a" -> 95.0, "a" -> 99.0, "b" -> 1.0))
    assert(got("a")._3 == 1.0, "disjoint bins")
    assert(got("b") == ((0L, 1L, 1.0)), "train-empty group")
    assert(got("c") == ((1L, 0L, 1.0)), "batch-empty group")
    // unequal sizes: train {bin0: 2}, batch {bin0: 1, bin1: 2}
    // TVD = 1/2 (|1 - 1/3| + |0 - 2/3|) = 2/3; integer form
    // Σ|n_b·M − m_b·N| = |1·2−2·3| + |2·2−0·3| = 8, / (2·2·3)
    val g2 = audit(
      train = Seq("x" -> 1.0, "x" -> 2.0),
      batch = Seq("x" -> 3.0, "x" -> 11.0, "x" -> 12.0))
    val want = BigDecimal(8.0 / (2.0 * 3.0 * 2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g2("x") == ((2L, 3L, want)))
  }

  test("null group keys and null values drift-compare like any other bucket") {
    // round-18 review: the USING full-outer join never equi-matched
    // null keys, so a null group (or the null-value bin) split into
    // one-sided rows and telescoped to a guaranteed-false TVD = 1.0.
    // Identical null-group distributions must report 0.
    val tr = Seq((Option.empty[String], Some(1.0)),
      (None, Some(2.0)), (Some("a"), Some(1.0)), (Some("a"), None))
    val bt = Seq((Option.empty[String], Some(1.0)),
      (None, Some(2.0)), (Some("a"), Some(1.0)), (Some("a"), None))
    val got = FeatureDrift.tvd(tr.toDF("g", "v"), bt.toDF("g", "v"),
        Seq("g"), "v", 10.0)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(None) === ((2L, 2L, 0.0)), s"null group false-alarmed: $got")
    assert(got(Some("a")) === ((2L, 2L, 0.0)),
      s"null-value bin false-alarmed: $got")
  }

  test("deterministic under partitioning") {
    val rng = new scala.util.Random(7)
    val tr = (0 until 500).map(_ => (s"g${rng.nextInt(3)}", rng.nextDouble() * 100))
    val bt = (0 until 400).map(_ => (s"g${rng.nextInt(3)}", rng.nextDouble() * 120))
    val a = FeatureDrift.tvd(tr.toDF("g", "v").repartition(7),
      bt.toDF("g", "v").repartition(2), Seq("g"), "v", 10.0)
      .collect().map(_.toSeq).toSet
    val b = FeatureDrift.tvd(tr.toDF("g", "v").repartition(1),
      bt.toDF("g", "v").repartition(9), Seq("g"), "v", 10.0)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("tvdTimeline: exact day-over-day values, boundary days dropped") {
    // day 0 (epochs 0..86399): g bins {0:2, 1:1}; day 1: {0:1, 1:2};
    // day 2: {0:3}. TVD(day1 vs day0) = 1/2(|2/3-1/3| + |1/3-2/3|) = 1/3
    // TVD(day2 vs day1) = 1/2(|1/3-1| + |2/3-0|) = 2/3
    val rows = Seq(
      ("g", 0L, 1.0), ("g", 10L, 2.0), ("g", 20L, 11.0),
      ("g", 86400L, 3.0), ("g", 86410L, 12.0), ("g", 86420L, 13.0),
      ("g", 172800L, 1.0), ("g", 172810L, 2.0), ("g", 172820L, 3.0))
    val got = FeatureDrift.tvdTimeline(
        rows.toDF("g", "epoch", "v").repartition(4), Seq("g"), "epoch", "v", 10.0)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L), s"boundary days must drop: $got")
    assert(got(1L) == ((3L, 3L, r9(6.0 / 18.0))))
    assert(got(2L) == ((3L, 3L, r9(12.0 / 18.0))))
  }

  test("tvdTimeline buckets pre-1970 epochs by FLOOR division (advice fix)") {
    // day -1 = epochs [-86400, -1]; day 0 = [0, 86399]. Truncating
    // `div` put epoch -1 into day 0 — merging histograms across the
    // 1970 boundary and diverging from the streaming twin
    // (Math.floorDiv) and the DuckDB oracle (`//`).
    val rows = Seq(
      ("g", -86400L, 1.0), ("g", -1L, 11.0), // day -1: bins {0:1, 1:1}
      ("g", 0L, 1.0), ("g", 10L, 2.0))       // day  0: bins {0:2}
    val got = FeatureDrift.tvdTimeline(
        rows.toDF("g", "epoch", "v").repartition(3), Seq("g"), "epoch", "v", 10.0)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // TVD(day0 vs day-1) = 1/2 (|1 − 1/2| + |0 − 1/2|) = 0.5
    assert(got == Map(0L -> ((2L, 2L, 0.5))),
      s"floor bucketing across the 1970 boundary broken: $got")
  }
}
