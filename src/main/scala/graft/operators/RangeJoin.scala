package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a cartesian product.
  *
  * A raw `a.ts BETWEEN b.start AND b.end` join has no equi-key, so
  * Spark plans BroadcastNestedLoopJoin — O(|A|·|B|) compares and a
  * broadcast requirement on one whole side. This operator restores an
  * equi-key by quantizing time into fixed-width bins:
  *
  *   1. each interval explodes to the bins it overlaps
  *      (`sequence(bin(start), bin(end))` — cost linear in
  *      interval-length / binWidth);
  *   2. each point computes its single bin;
  *   3. hash equi-join on the bin, then the exact range predicate.
  *
  * A qualifying (interval, point) pair meets in EXACTLY one bin — the
  * point's — so the join emits no duplicates and needs no post-dedup.
  *
  * Scale shape: one hash shuffle keyed by bin on each side (the
  * standard interval-binning plan in streaming/OLAP engines). Pick
  * `binMicros` near the typical interval length: wider bins mean fewer
  * replicas per interval but more false candidates for the range
  * filter; hot bins are AQE-skew-splittable like any hash join key.
  * Left-outer counting recipe: aggregate the pairs by interval id and
  * left-join the (ids-only) counts back to the interval table.
  */
object RangeJoin {

  /** exact floor division of a long column (pmod keeps it floor, not
    * truncate-toward-zero, for pre-epoch timestamps; the final divide
    * is INTEGRAL `div` — `/` promotes to double and loses exactness
    * past 2^53, where a one-ulp rounding of the numerator can shift a
    * point one bin off and silently drop a contained pair — round-18
    * review; the numerator is an exact multiple of w, so div ≡ floor) */
  private def binOf(c: Column, w: Long): Column =
    DistributedRank.idiv(c - pmod(c, lit(w)), lit(w))

  /** Inner join of `points` rows onto the `intervals` rows whose
    * `[startCol, endCol]` (inclusive) contains `ptCol`. All columns of
    * both inputs survive; names must not collide. Intervals with
    * `end < start` are degenerate and match nothing.
    */
  def pointInInterval(intervals: DataFrame, startCol: String, endCol: String,
                      points: DataFrame, ptCol: String,
                      binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet)
    require(overlap.isEmpty,
      s"column collision between sides: ${overlap.mkString(",")}")

    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bin", explode(sequence(
        binOf(unix_micros(col(startCol)), binMicros),
        binOf(unix_micros(col(endCol)), binMicros))))
    val pt = points
      .withColumn("__bin", binOf(unix_micros(col(ptCol)), binMicros))
    iv.join(pt, Seq("__bin"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
