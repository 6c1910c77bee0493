package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** QuantileSketch: the merged-per-bucket answer must equal the
  * direct single-sketch answer (mergeability), survive a parquet
  * round-trip unchanged (the persisted-pre-aggregate deployment), and
  * sit within one bin width of the exact percentile (the error bound).
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val bins = 64

  private lazy val events = graft.Tables(spark, "/root/testdata/sf0.01")
    .events
    .select(col("event_type"), to_date(col("ts")).as("day"),
      col("value").cast("double").as("value"))
    .localCheckpoint()

  private lazy val (lo, hi) = {
    val r = events.agg(min(col("value")), max(col("value"))).head()
    (r.getDouble(0), r.getDouble(1))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap

  test("merging per-day sketches equals one direct sketch") {
    val daily = QuantileSketch.histogram(events, "value", Seq("event_type"),
      col("day"), "day", lo, hi, bins)
    val direct = QuantileSketch.histogram(events, "value", Seq("event_type"),
      lit(0), "all", lo, hi, bins)
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
    val merged = asMap(QuantileSketch.percentiles(daily, Seq("event_type"), qs, lo, hi, bins))
    val single = asMap(QuantileSketch.percentiles(direct, Seq("event_type"), qs, lo, hi, bins))
    assert(merged === single)
    assert(merged.nonEmpty)
  }

  test("null values are excluded, not counted as lo-valued bin-0 rows") {
    // round-18 review: floor(null−lo/w) is null and Spark's
    // null-skipping greatest(null, 0) clamped every null row into
    // bin 0, shifting all merged percentiles low. Nulls must not
    // contribute at all — the ExactQuantile convention.
    val clean = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(30.0)))
    val withNulls = clean ++ Seq(("a", Option.empty[Double]),
      ("a", Option.empty[Double]))
    def p50(rows: Seq[(String, Option[Double])]) = asMap(
      QuantileSketch.percentiles(
        QuantileSketch.histogram(rows.toDF("g", "value"), "value",
          Seq("g"), lit(0), "all", 0.0, 40.0, 8),
        Seq("g"), Seq("p50" -> 0.5, "p90" -> 0.9), 0.0, 40.0, 8))
    val a = p50(clean); val b = p50(withNulls)
    assert(a === b, s"nulls moved the sketch: clean=$a withNulls=$b")
    assert(a("a")._3 === 3L, "n must count only non-null values")
  }

  test("sketch table round-trips through parquet unchanged") {
    val daily = QuantileSketch.histogram(events, "value", Seq("event_type"),
      col("day"), "day", lo, hi, bins)
    val path = java.nio.file.Files.createTempDirectory("qsketch").toString + "/t"
    daily.write.parquet(path)
    val qs = Seq("p50" -> 0.5, "p90" -> 0.9)
    val fromDisk = asMap(QuantileSketch.percentiles(
      spark.read.parquet(path), Seq("event_type"), qs, lo, hi, bins))
    assert(fromDisk === asMap(
      QuantileSketch.percentiles(daily, Seq("event_type"), qs, lo, hi, bins)))
  }

  test("error vs the exact percentile is bounded by one bin width") {
    val width = (hi - lo) / bins
    val daily = QuantileSketch.histogram(events, "value", Seq("event_type"),
      col("day"), "day", lo, hi, bins)
    val approx = asMap(QuantileSketch.percentiles(daily, Seq("event_type"),
      Seq("p50" -> 0.5, "p90" -> 0.9), lo, hi, bins))
    // exact: sort-based per-group percentile (q31's definition family)
    val exact = events.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("e50"),
        expr("percentile(value, 0.9)").as("e90"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (p50, p90, n)) =>
      assert(n === exact(k)._3, s"count mismatch for $k")
      // the sketch returns a bin upper edge; the exact percentile
      // (interpolated) lies within that bin or the one below
      assert(math.abs(p50 - exact(k)._1) <= 2 * width,
        s"$k p50 $p50 vs exact ${exact(k)._1}, width $width")
      assert(math.abs(p90 - exact(k)._2) <= 2 * width,
        s"$k p90 $p90 vs exact ${exact(k)._2}, width $width")
    }
  }

  test("histogram counts: every row lands in exactly one bin") {
    val daily = QuantileSketch.histogram(events, "value", Seq("event_type"),
      col("day"), "day", lo, hi, bins)
    val total = daily.select(explode(col("counts")).as("c"))
      .agg(sum(col("c"))).head().getLong(0)
    assert(total === events.count())
    assert(daily.select(size(col("counts"))).distinct().head().getInt(0) === bins)
  }
}
