package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Distributed per-group ranks, running sums, and rolling range
  * aggregates — the scale-safe replacement for
  * `Window.partitionBy(lowCardinalityKey).orderBy(...)`.
  *
  * A keyed window is only as parallel as its key cardinality: with 5
  * order priorities (or ~6 event types, or ~5 languages) the ENTIRE
  * table funnels through 5 sort tasks — the classic last-reducer
  * scale-killer, regardless of row width (round-12 verdict on
  * q128/q131). Both entry points here bound every sort task by a
  * SHARD of the data instead, at the cost of one extra (skinny)
  * shuffle and a metadata-sized side table:
  *
  * `prefix` — the TWO-PASS DISTRIBUTED PREFIX SUM, the same device
  * [[graft.llm.TextOps.packSequences]] uses for the global token
  * offset, generalized to per-GROUP ranks and running sums:
  *   1. range-partition by (group ++ order) into `numShards`
  *      order-disjoint shards and materialize (`localCheckpoint`, so
  *      both passes read the SAME partition assignment);
  *   2. pass 1: per-(shard, group) row counts and value sums — at
  *      most `shards + |groups|` rows because a group's rows are
  *      CONTIGUOUS across range shards. Exclusive prefix offsets per
  *      group come from a window over THIS metadata-sized table
  *      (keyed by group, ordered by shard id);
  *   3. pass 2: per-(shard, group) window — every shard is an
  *      independent sort task — plus the broadcast base offsets.
  * No sort task ever sees more than one shard; the only wide shuffle
  * payload is the caller's (pre-projected, skinny) frame.
  *
  * `rollingRange` — trailing event-time window via CHUNK + DONOR
  * REPLICATION: bucket rows into `windowSecs`-wide chunks, replicate
  * each row once into the NEXT chunk as a frame donor, and run the
  * RANGE frame inside (group, chunk) partitions. A trailing frame of
  * width `windowSecs` can only reach the current and previous chunk,
  * so the partition-local frame equals the global one exactly (ties
  * included — equal timestamps always share a chunk); donor copies
  * are dropped after the window. Parallelism grows with the TIME SPAN
  * of the data, not the group-key cardinality; each task holds ~2
  * chunks of one group's rows (callers with a group hotter than one
  * task per window-interval sub-split the group key upstream).
  */
object DistributedRank {

  /** Adds `__rank` (1-based position of the row within its group
    * under `orderCols`), `__n` (group row count), and for every
    * `sumCols` entry c an inclusive running sum `__cum_c` — exactly
    * `row_number()` / `count()` / `sum().over(unboundedPreceding ..
    * currentRow)` over `Window.partitionBy(groupCols)
    * .orderBy(orderCols)`, but with every sort task bounded by a
    * range shard.
    *
    * Contract: `groupCols ++ orderCols` must be a TOTAL order (give a
    * unique tiebreaker — ranks of tied rows would otherwise be
    * partition-assignment-dependent). Null GROUP keys form their own
    * group, exactly like the naive window (the base-offset join is
    * null-safe — a plain equi-join would silently DROP null-group
    * rows, the one failure mode worse than a wrong plan); null order
    * values sort nulls-first in both the range partitioner and the
    * shard window, also the window default. `sumCols` must be
    * exact-typed (integral/decimal) for engine-identical totals.
    *
    * @param numShards range shards (0 = session shuffle parallelism);
    *   each shard must fit one sort task
    */
  def prefix(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
             sumCols: Seq[String] = Nil, numShards: Int = 0): DataFrame = {
    require(groupCols.nonEmpty, "DistributedRank.prefix: need group columns")
    require(orderCols.nonEmpty, "DistributedRank.prefix: need order columns")
    val spark = df.sparkSession
    val shards =
      if (numShards > 0) numShards
      else spark.sessionState.conf.numShufflePartitions
    val g = groupCols.map(col)
    // explicit shard count: AQE never coalesces a user-pinned
    // repartition, so __part is stable for the checkpoint's lifetime
    val ranged = df
      .repartitionByRange(shards, (groupCols ++ orderCols).map(col): _*)
      .withColumn("__part", spark_partition_id())
      .localCheckpoint()
    // pass 1: (shard, group) partials — ≤ shards + |groups| rows, so the
    // group-keyed offset windows below run over METADATA, not the corpus
    val aggs = count(lit(1)).as("__pc") +:
      sumCols.map(c => sum(col(c)).as(s"__ps_$c"))
    val partials = ranged.groupBy((col("__part") +: g): _*)
      .agg(aggs.head, aggs.tail: _*)
    val exW = Window.partitionBy(g: _*).orderBy(col("__part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(g: _*)
    val bases = sumCols.foldLeft(
      partials
        .withColumn("__base_rank", coalesce(sum(col("__pc")).over(exW), lit(0L)))
        .withColumn("__n", sum(col("__pc")).over(totW))) { (d, c) =>
        d.withColumn(s"__base_$c", coalesce(sum(col(s"__ps_$c")).over(exW), lit(0L)))
      }.drop("__pc" +: sumCols.map(c => s"__ps_$c"): _*)
    // pass 2: shard-local window (parallel across shards) + broadcast bases
    val ordW = Window.partitionBy((col("__part") +: g): _*)
      .orderBy(orderCols.map(col): _*)
    val cumW = ordW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe on the group keys: groupBy above put null groups in the
    // partials, so the join back must match them too. The bases keys
    // are RENAMED copies — a same-attribute condition (ranged(c) <=>
    // bases(c)) resolves through the self-join disambiguator and logs
    // a trivially-true-predicate WARN per query; distinct names keep
    // the condition unambiguous and the logs quiet.
    val keys = "__part" +: groupCols
    val keyed = keys.foldLeft(bases)((d, c) => d.withColumnRenamed(c, s"__bk_$c"))
    val joinCond = keys.map(c => col(c) <=> col(s"__bk_$c")).reduce(_ && _)
    val joined = ranged.join(broadcast(keyed), joinCond)
      .drop(keys.map(c => s"__bk_$c"): _*)
    val out = sumCols.foldLeft(
      joined
        .withColumn("__rank", col("__base_rank") + row_number().over(ordW))) {
        (d, c) => d.withColumn(s"__cum_$c", col(s"__base_$c") + sum(col(c)).over(cumW))
      }
    out.drop("__part" +: "__base_rank" +: sumCols.map(c => s"__base_$c"): _*)
  }

  /** Adds `__roll_n` (row count) and, for every `sumCols` entry c, a
    * sum `__roll_c` over the trailing event-time frame
    * `[epochCol - windowSecs + 1, epochCol]` per group — exactly
    * `count/sum.over(Window.partitionBy(groupCols).orderBy(epochCol)
    * .rangeBetween(-(windowSecs-1), 0))`, but partitioned by
    * (group, chunk) with one donor replica per row, so no task sorts
    * more than ~2 chunks of one group. `epochCol` must be integral
    * non-negative seconds; `sumCols` exact-typed for
    * order-independent totals.
    */
  def rollingRange(df: DataFrame, groupCols: Seq[String], epochCol: String,
                   windowSecs: Long, sumCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "DistributedRank.rollingRange: need group columns")
    require(windowSecs >= 1, "DistributedRank.rollingRange: window must be >= 1s")
    val chunk = expr(s"$epochCol div ${windowSecs}L")
    val own = df.withColumn("__chunk", chunk).withColumn("__own", lit(true))
    val donor = df.withColumn("__chunk", chunk + lit(1L)).withColumn("__own", lit(false))
    val w = Window.partitionBy((groupCols.map(col) :+ col("__chunk")): _*)
      .orderBy(col(epochCol)).rangeBetween(-(windowSecs - 1), 0)
    val windowed = sumCols.foldLeft(
      own.unionByName(donor).withColumn("__roll_n", count(lit(1)).over(w))) {
        (d, c) => d.withColumn(s"__roll_$c", sum(col(c)).over(w))
      }
    windowed.filter(col("__own")).drop("__chunk", "__own")
  }

  /** `ntile(buckets)` as an exact integer function of (`rank`, `n`)
    * under a total order: the first n%buckets buckets take
    * n/buckets + 1 rows, the rest n/buckets (the SQL-standard fill
    * Spark's and DuckDB's ntile both implement). Pure arithmetic on
    * `prefix`'s outputs — no window needed.
    */
  def ntileFromRank(rank: Column, n: Column, buckets: Int): Column = {
    require(buckets >= 1)
    val q = idiv(n.cast("long"), lit(buckets.toLong))
    val r = n.cast("long") % buckets
    val k = rank.cast("long")
    val headRows = r * (q + lit(1L))
    when(k <= headRows, idiv(k - 1, q + lit(1L)) + lit(1L))
      .otherwise(r + idiv(k - headRows - lit(1L), q) + lit(1L))
      .cast("int")
  }

  /** Exact integer division (SQL `div`) in the Column DSL — shared
    * with RangeJoin.binOf (round-18 review: a `/` there promoted to
    * double and lost bin exactness past 2^53).
    */
  private[operators] def idiv(a: Column, b: Column): Column =
    ColumnShim.column(new IntegralDivide(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** `percent_rank()` from (`rank`, `n`) under a total order:
    * (rank-1)/(n-1), 0.0 for a single-row group (Spark's convention).
    */
  def percentRankFromRank(rank: Column, n: Column): Column =
    when(n === 1, lit(0.0))
      .otherwise((rank - lit(1)).cast("double") / (n - lit(1)).cast("double"))

  /** `cume_dist()` from (`rank`, `n`) under a total order: rank/n. */
  def cumeDistFromRank(rank: Column, n: Column): Column =
    rank.cast("double") / n.cast("double")
}
