package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.functions.{InterleaveBits, RankBucket}

/** Z-order (Morton-curve) file layout — multi-dimensional clustering
  * for data skipping, the lakehouse companion to `Layout.writeBucketed`
  * (which optimizes joins; this optimizes selective scans).
  *
  * Sorting files by ONE column makes that column's per-file min/max
  * ranges narrow and every other column's ranges span the whole table:
  * a predicate on any non-sort column reads everything. Z-ordering
  * ranks every layout column into equi-depth buckets (sampled
  * quantile boundaries — balanced under skew), interleaves the bucket
  * bits into one Morton key, and range-partitions + sorts by that key:
  * rows close in EVERY dimension co-locate, so per-file min/max stats
  * stay narrow on ALL layout columns at once and a selective predicate
  * on any of them prunes most files (ZOrderSpec measures this against
  * the single-column layout on the same data).
  *
  * Scale shape: one `approxQuantile` pass (driver holds
  * `(2^bits - 1) × dims` doubles), then ONE range shuffle on the
  * Morton key — the same cost as any global sort-for-layout write; the
  * rank + interleave per row is two native codegen'd expressions.
  */
object ZOrder {

  /** The Morton sort key for `cols` (numeric): equi-depth rank per
    * column (sampled at `relErr` accuracy), bits interleaved. Nulls
    * and NaNs rank 0 — they cluster at the curve origin.
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8,
             relErr: Double = 0.001): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits.toLong * cols.length <= 63,
      s"${cols.length} dims x $bits bits must fit 63 bits")
    cols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[NumericType],
        s"z-order column $c must be numeric, is ${df.schema(c).dataType.simpleString}")
    }
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val quantiles = df.stat.approxQuantile(cols.toArray, probs, relErr)
    val buckets: Seq[Column] = cols.zip(quantiles).map { case (c, qs) =>
      // a column containing NaN can surface NaN quantile boundaries;
      // non-finite cuts would violate RankBucket's strictly-ascending
      // contract and fail the whole layout write, while NaN rows
      // themselves already rank 0 by the bucket function
      val bounds = qs.filter(java.lang.Double.isFinite).distinct.sorted
      if (bounds.isEmpty) lit(0) // all-null column: single bucket
      else RankBucket(col(c).cast("double"), bounds)
    }
    InterleaveBits(array(buckets: _*), bits)
  }

  /** Write `df` as `numFiles` parquet files clustered along the
    * Z-curve of `cols`. The Morton key orders the write and is not
    * part of the output schema.
    */
  def write(df: DataFrame, cols: Seq[String], path: String,
            numFiles: Int, bits: Int = 8): Unit = {
    require(numFiles >= 1, "numFiles must be positive")
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
