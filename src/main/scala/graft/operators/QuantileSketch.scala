package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-bucket mergeable quantile sketches — q59's deployment pattern
  * (per-day persisted pre-aggregates, merged at query time) applied to
  * percentiles. Spark's `approx_percentile` buffer cannot round-trip
  * through storage (the sketch state is internal to the aggregate), so
  * the sketch here is a FIXED-BIN histogram: an `array<bigint>` of bin
  * counts per (group, bucket) row. That choice buys three properties
  * the builtin cannot offer:
  *   - merge = elementwise sum — fully distributive, so per-day rows
  *     combine across any partitioning, storage round-trip, or
  *     late-arriving day with no accuracy interaction;
  *   - determinism — bin boundaries are a pure function of (lo, hi,
  *     bins), so the merged percentile is VALUE-DEFINED and
  *     oracle-checkable (unlike KLL/GK sketches whose answer depends
  *     on merge order), with error bounded by one bin width
  *     (hi-lo)/bins;
  *   - O(bins) state per group-bucket — a few KB rides the exchange
  *     and the parquet row, never the value population.
  *
  * Scale shape: the histogram build is one map-side-combinable keyed
  * shuffle (group, bucket, bin); the merge explodes O(bins) rows per
  * sketch row, sums per (group, bin), and extracts percentiles with a
  * per-group window over `bins` rows — no stage ever sees raw values.
  * The 100 TB dashboard maintains the per-day table incrementally
  * (new days append) and pays only the merge query per refresh.
  */
object QuantileSketch {

  /** Build the per-(groupCols, bucket) histogram sketch table:
    * one row per group × bucket with a `counts` array of `bins`
    * elements. Values are clamped into [lo, hi] (bin = floor((v-lo)/w)
    * clamped to [0, bins-1]) — pass the data's true min/max for
    * clamp-free binning.
    */
  /** The bin index of `value` under the (lo, hi, bins) grid —
    * floor((v-lo)/width) clamped into [0, bins-1]. Shared by the batch
    * histogram build and the streaming producer
    * (`streaming.EventStream.valueHistograms`), so a stream-maintained
    * sketch table and a batch-built one agree bin-for-bin.
    */
  def binExpr(value: Column, lo: Double, hi: Double, bins: Int): Column = {
    require(bins >= 1, "bins must be positive")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val width = (hi - lo) / bins
    least(
      greatest(floor((value.cast("double") - lit(lo)) / lit(width)), lit(0L)),
      lit((bins - 1).toLong)).cast("int")
  }

  def histogram(df: DataFrame, valueCol: String, groupCols: Seq[String],
                bucketExpr: Column, bucketName: String,
                lo: Double, hi: Double, bins: Int = 256): DataFrame = {
    val bin = binExpr(col(valueCol), lo, hi, bins)
    val keyCols = groupCols.map(col) :+ col(bucketName)
    // null values are EXCLUDED, the ExactQuantile convention — without
    // the filter, floor(null-lo/w) is null and Spark's null-skipping
    // greatest(null, 0) silently lands every null row in bin 0 as a
    // lo-valued observation, shifting all merged percentiles low
    // (round-18 review); NaN stays the documented clamp-to-top edge
    df.filter(col(valueCol).isNotNull)
      .select((groupCols.map(col) :+ bucketExpr.as(bucketName) :+
        bin.as("__bin")): _*)
      .groupBy((keyCols :+ col("__bin")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(keyCols: _*)
      .agg(map_from_entries(collect_list(struct(col("__bin"), col("__cnt"))))
        .as("__m"))
      .select((keyCols :+
        transform(sequence(lit(0), lit(bins - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L))).as("counts")): _*)
  }

  /** Merge sketch rows across buckets and extract percentiles per
    * group: for each (name, q), the upper edge of the first bin whose
    * cumulative count reaches q × total — deterministic, error ≤ one
    * bin width. Output: (groupCols..., <name> per entry, n).
    * (lo, hi, bins) must be the values the sketch was built with.
    */
  def percentiles(sketch: DataFrame, groupCols: Seq[String],
                  qs: Seq[(String, Double)],
                  lo: Double, hi: Double, bins: Int = 256): DataFrame =
    percentilesFromBins(
      sketch.select((groupCols.map(col) :+
        posexplode(col("counts")).as(Seq("__pos", "__cnt"))): _*),
      groupCols, qs, lo, hi, bins, binCol = "__pos", cntCol = "__cnt")

  /** [[percentiles]] over the ROW-form sketch — `(groupCols..., bin,
    * count)` rows, the shape the streaming producer emits (an append
    * stream cannot rewrite a per-window array, but it can append bin
    * rows; summing them per (group, bin) is the same elementwise merge).
    */
  def percentilesFromBins(binRows: DataFrame, groupCols: Seq[String],
                          qs: Seq[(String, Double)],
                          lo: Double, hi: Double, bins: Int = 256,
                          binCol: String = "bin",
                          cntCol: String = "n"): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 })
    val width = (hi - lo) / bins
    val g = groupCols.map(col)
    val merged = binRows
      .groupBy((g :+ col(binCol).as("__pos")): _*)
      .agg(sum(col(cntCol)).as("__cnt"))
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__pos"))
    val wAll = Window.partitionBy(g: _*)
    val cum = merged
      .withColumn("__cum", sum(col("__cnt")).over(wOrd))
      .withColumn("__tot", sum(col("__cnt")).over(wAll))
    val aggs = qs.map { case (name, q) =>
      round(lit(lo) + (min(when(col("__cum") >= lit(q) * col("__tot"),
        col("__pos"))) + 1) * lit(width), 9).as(name)
    } :+ max(col("__tot")).as("n")
    cum.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
  }
}
