package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed backward as-of join: for each left row, attach the most
  * recent right row whose timestamp is at or before the left row's,
  * within the same key group.
  *
  * Spark has no ASOF JOIN operator (DuckDB/Pandas do); the naive
  * translations are a range self-join (quadratic per key) or a
  * driver-side merge. This plan stays fully distributed with ONE keyed
  * shuffle:
  *
  *   1. tag both sides and union them (right payload packed into ONE
  *      struct so a match is atomic — payload columns can never mix
  *      across right rows);
  *   2. window `partitionBy(keys).orderBy(ts, side)` with
  *      `last(payload, ignoreNulls=true)` over unbounded-preceding —
  *      each left row picks up the latest right struct at or before
  *      it. Right sorts before left on ties, giving the inclusive
  *      (`left.ts >= right.ts`) ASOF semantics;
  *   3. keep the left rows, unpack the struct.
  *
  * Scale shape: identical to sessionization (q35) — hash shuffle on
  * the key, per-key sort within partitions, no single-partition stage
  * and nothing on the driver. Hot keys are AQE-splittable because the
  * window only needs key-local order.
  *
  * Contract: right must be unique per (keys, rightTs) — pre-aggregate
  * duplicates (the oracle engines make the same arbitrary-match choice
  * otherwise, so uniqueness is what makes the result well-defined).
  */
object AsOfJoin {

  /** Left as-of (backward, inclusive) join.
    *
    * @param left      probe side; all its columns survive
    * @param right     build side; `payloadCols` survive on a match,
    *                  null otherwise (left-outer semantics)
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTs    left ordering column name
    * @param rightTs   right ordering column name; emitted alongside the
    *                  payload so callers see WHICH right row matched
    * @param payloadCols right columns to carry onto matching left rows
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payloadCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val leftCols = left.columns.toSeq
    val emitted = rightTs +: payloadCols
    require(emitted.forall(!leftCols.contains(_)),
      s"right output columns ${emitted.mkString(",")} must not collide " +
        "with left columns — rename on the right side first")
    // the join's internal working columns would silently overwrite a
    // same-named input column (a left `__ts` would emerge as a copy of
    // leftTs) — reject them on either side
    val reserved = Seq("__ts", "__side", "__match", "__hit")
    val clash = reserved.filter(n =>
      leftCols.contains(n) || right.columns.contains(n))
    require(clash.isEmpty,
      s"column names [${clash.mkString(",")}] are reserved by the as-of " +
        "join internals — rename them on the input first")

    // one struct per right row: match atomicity + a single ignoreNulls
    val payload = struct((rightTs +: payloadCols).map(col): _*)

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__match", lit(null).cast(
        right.select(payload).schema.head.dataType))
    val r = right
      .withColumn("__match", payload)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((keys.map(col) ++ Seq(col("__match"), col("__ts"), col("__side"))): _*)
    // null-fill the left-only columns on the right rows
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (keys.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(rAligned.select(l.columns.map(col): _*))
      .withColumn("__hit", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        (rightTs +: payloadCols).map(c => col(s"__hit.$c").as(c)): _*)
  }
}
