package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-manifest data skipping — min/max pruning at the FILE-LIST level,
  * the third layout lever next to `Layout.writeBucketed` (join
  * co-location) and `ZOrder.write` (row-group clustering).
  *
  * Parquet already stores per-row-group min/max, but Spark only consults
  * those AFTER scheduling a task per file: every file in a 100 TB table
  * still costs a task launch, a footer fetch and an S3 GET even when its
  * whole range misses the predicate. A manifest — one tiny row of
  * per-column min/max per file, built by ONE scan and maintained
  * incrementally per appended file — lets the driver drop non-matching
  * files from the read plan before any task exists. This is precisely
  * the mechanism behind Delta/Iceberg data skipping, expressed here over
  * plain parquet directories.
  *
  * Scale shape: `collectStats` is one full scan (the once-per-layout
  * cost, like the bucketed/Z-ordered writes; incremental maintenance
  * appends one row per new file). The manifest itself is O(files) rows
  * of a few hundred bytes — driver-collectable far past 100 TB (100k
  * files ≈ a few MB). Pruning is an interval-overlap filter on that
  * tiny table; the residual predicate still runs on the surviving rows,
  * so a too-coarse manifest can only cost speed, never correctness.
  */
object Manifest {

  private def perFileStats(df: DataFrame, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "manifest needs at least one stat column")
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Per-file statistics for `statCols`: one row per parquet file with
    * `n_rows` and `min_<c>` / `max_<c>` per column, from ONE scan.
    * All-null files keep null min/max (treated as non-prunable by
    * `prune` — they must be read, the residual filter decides).
    */
  def collectStats(spark: SparkSession, path: String,
                   statCols: Seq[String]): DataFrame =
    perFileStats(spark.read.parquet(path), statCols)

  /** Incremental maintenance: scan ONLY `newFiles` (an appended batch)
    * and union their rows with the existing manifest — the per-append
    * cost is O(new data), never a history rescan. `statCols` must match
    * the columns the manifest was built with.
    */
  def appendStats(spark: SparkSession, manifest: DataFrame,
                  newFiles: Seq[String], statCols: Seq[String]): DataFrame = {
    require(newFiles.nonEmpty, "appendStats needs at least one new file")
    manifest.unionByName(perFileStats(spark.read.parquet(newFiles: _*), statCols))
  }

  /** The files whose `[min_c, max_c]` interval overlaps `[lo, hi]`
    * (either bound may be null = unbounded). Files with null stats
    * survive: no evidence is not evidence of absence.
    */
  def prune(manifest: DataFrame, c: String, lo: Column, hi: Column): Seq[String] = {
    val minC = col(s"min_$c")
    val maxC = col(s"max_$c")
    val miss = (maxC < lo) || (minC > hi) // null-safe: null comparison ⇒ null ⇒ keep
    manifest.filter(!coalesce(miss, lit(false)))
      .select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** Read only the files surviving the manifest prune for
    * `c ∈ [lo, hi]`. The caller MUST still apply the real predicate —
    * pruning is file-granular, surviving files contain misses too.
    * An empty survivor set returns an empty frame with the full schema.
    */
  def prunedRead(spark: SparkSession, path: String, manifest: DataFrame,
                 c: String, lo: Column, hi: Column): DataFrame = {
    val files = prune(manifest, c, lo, hi)
    val schema = spark.read.parquet(path).schema
    if (files.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }
}
