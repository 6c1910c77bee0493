package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed interval-overlap join (interval × interval — the
  * missing sibling of `RangeJoin`'s point-in-interval): all pairs
  * whose closed intervals intersect, without ever forming the
  * cartesian pair space.
  *
  * Strategy: fixed-width binning. Each interval replicates to the
  * bins it covers (cost `length/binSize` rows per interval), the
  * candidate join is an EQUI-join on the bin, and overlap is verified
  * on the candidate. De-dup is free by construction — two overlapping
  * intervals share every bin in their intersection, so the pair is
  * emitted ONLY from the bin containing `max(lStart, rStart)` (the
  * first shared bin): exactly-once without a distinct pass, the
  * standard spatial-join reporting trick.
  *
  * Scale: shuffles are keyed on the bin; the `binSize` knob trades
  * replication (long intervals × small bins) against bin-local pair
  * density (hot bins × large bins), and a runtime-skewed hot bin is
  * AQE's skew-join case (the q37/q86 salting patterns apply if one
  * bin dominates pathologically). Never quadratic in the inputs —
  * only in per-bin occupancy, which `binSize` controls.
  *
  * Contract: bounds are non-negative longs (epoch seconds or any
  * monotone unit; integral `div` truncation == floor only for
  * non-negatives), closed intervals (`end` inclusive; touching
  * endpoints DO overlap), `start ≤ end` — violations fail loudly via
  * `raise_error`, never a silent drop. Left and right column sets
  * must be disjoint so the joined row can carry both sides unrenamed.
  */
object IntervalJoin {

  def overlap(left: DataFrame, right: DataFrame,
              lStart: String, lEnd: String, rStart: String, rEnd: String,
              binSize: Long): DataFrame = {
    require(binSize > 0, "IntervalJoin.overlap: binSize must be positive")
    for ((df, cols) <- Seq((left, Seq(lStart, lEnd)), (right, Seq(rStart, rEnd)));
         c <- cols)
      require(df.columns.contains(c), s"IntervalJoin.overlap: missing column $c")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"IntervalJoin.overlap: column names must be disjoint, both sides have " +
        s"[${shared.mkString(", ")}]")

    // integral `div`, not double division: exact at any magnitude.
    // Null bounds are violations too: without the isnull arms they'd
    // fall to otherwise(), then explode(sequence(null, …)) silently
    // drops the row instead of honoring the fail-loudly contract.
    def binned(df: DataFrame, s: String, e: String, bin: String) = df
      .withColumn("__vstart",
        when(isnull(col(s)) || isnull(col(e)) || col(s) < 0 || col(s) > col(e),
          raise_error(concat(
            lit(s"IntervalJoin: invalid interval ($s, $e) = ("),
            coalesce(col(s).cast("string"), lit("null")), lit(", "),
            coalesce(col(e).cast("string"), lit("null")), lit(")"))))
          .otherwise(col(s)))
      .withColumn(bin, explode(sequence(
        expr(s"__vstart div ${binSize}L"), expr(s"$e div ${binSize}L"))))
      .drop("__vstart")

    binned(left, lStart, lEnd, "__lbin")
      .join(binned(right, rStart, rEnd, "__rbin"),
        col("__lbin") === col("__rbin") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          expr(s"greatest($lStart, $rStart) div ${binSize}L") === col("__lbin"))
      .drop("__lbin", "__rbin")
  }
}
