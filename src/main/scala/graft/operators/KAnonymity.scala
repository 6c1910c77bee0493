package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-anonymity ENFORCEMENT — the operational closure of the q118
  * audit: rows are released only inside a quasi-identifier cell with
  * ≥ k members, escalating through a generalization ladder and
  * suppressing what never qualifies.
  *
  * Algorithm (iterative local recoding over bucket widths):
  * for each width w in the ascending ladder, bucket the numeric
  * quasi-identifier to its FLOOR multiple `value − pmod(value, w)`
  * (floor, not `div`'s truncate-toward-zero: a negative value — a
  * balance, a temperature — must release a `[bucket_lo, bucket_lo+w)`
  * label that actually CONTAINS it, and DuckDB's `//` floors, so
  * floor is also the cross-engine agreement; round-18 review), count
  * cells OVER THE ROWS
  * STILL UNRELEASED, release the rows of ≥ k cells at this width, and
  * carry the rest to the next (coarser) width. Rows still sub-k after
  * the coarsest width are SUPPRESSED (dropped). Counting over the
  * remaining rows — not the full dataset — is what makes the
  * guarantee hold: every released (cell, width) group is exactly a
  * counted cell, so its size is ≥ k by construction (a full-dataset
  * count would let a coarse cell release a < k leftover after its
  * fine sub-cells released theirs). The per-width release decision is
  * a pure function of cell counts, so the output is deterministic on
  * any partitioning.
  *
  * Scale shape: per width, ONE map-side-combined aggregate over the
  * remaining rows produces the (cells × 1) count table — broadcast
  * back when the counted cell cardinality is under
  * `maxBroadcastCells`, else joined as an ordinary shuffle join (the
  * quasi × bucket domain can outgrow a driver at 100 TB even though
  * real quasi-identifier ladders rarely do; the guard costs one
  * map-side-combined count per width). The remaining set is the
  * sub-k risk TAIL (cells × < k rows), which collapses fast — it is
  * localCheckpoint-ed per level so later levels and the released
  * union never re-derive earlier levels; checkpoint cost is
  * proportional to the tail, not the corpus.
  */
object KAnonymity {

  /** Released rows with their generalized cell: all input columns +
    * (`bucket_lo` LONG, `bucket_width` LONG). Suppressed rows are
    * dropped; callers audit via `df.count - released.count`.
    *
    * `starLadder` appends CATEGORICAL generalization rungs after the
    * numeric ladder exhausts: rung j re-runs the COARSEST numeric
    * width with the first j+1 ladder columns recoded to `"*"`
    * (cumulative — real local recoding coarsens whole quasi-columns,
    * not just the numeric bucket; Sweeney 2002's suppression
    * hierarchy, LeFevre et al.'s Mondrian as the multidim variant).
    * Released rows CARRY the starred values — that substitution IS
    * the anonymization. Counting stays over the remaining rows at
    * every rung, so the ≥ k guarantee argument above is unchanged;
    * starring is monotone down the ladder, so a row's earlier-starred
    * columns never need their original values again and the sub-k
    * tail can carry recoded values forward.
    */
  def enforce(df: DataFrame, quasiCols: Seq[String], valueCol: String,
              widths: Seq[Long], k: Long,
              maxBroadcastCells: Long = 1L << 21,
              starLadder: Seq[String] = Nil): DataFrame = {
    require(quasiCols.nonEmpty, "KAnonymity.enforce: need quasi-identifier columns")
    require(widths.nonEmpty && widths.forall(_ > 0) &&
      widths == widths.sorted && widths.distinct == widths,
      s"KAnonymity.enforce: widths must be positive, ascending, distinct: $widths")
    require(k >= 1, s"KAnonymity.enforce: k must be >= 1, got $k")
    require(starLadder.forall(quasiCols.contains) &&
      starLadder.distinct == starLadder,
      s"KAnonymity.enforce: starLadder must be distinct quasi columns: $starLadder")
    // lit("*") recoding is only type-stable on string columns — a
    // numeric ladder column would silently widen the earlier rungs'
    // released column to string through the cross-rung unionByName
    // (round-13 advice); callers cast + document explicitly instead
    starLadder.foreach { c =>
      require(df.schema(c).dataType == org.apache.spark.sql.types.StringType,
        s"KAnonymity.enforce: starLadder column '$c' must be StringType " +
          s"(got ${df.schema(c).dataType.simpleString}); cast it explicitly")
    }
    val q = quasiCols.map(col)
    // rung = (numeric width, columns recoded to '*'): the numeric
    // ladder first, then cumulative column suppression at the widest w
    val rungs: Seq[(Long, Seq[String])] =
      widths.map(w => (w, Seq.empty[String])) ++
        starLadder.indices.map(j => (widths.last, starLadder.take(j + 1)))
    // Materialize the input once: every rung consumes `remaining`
    // up to three times (the cell-count pass, the released-rows side
    // of the join, the sub-k tail feeding the next rung), and rungs
    // after the first already read a checkpoint — but the FIRST rung
    // used to re-evaluate the caller's whole upstream pipeline per
    // consumer (q145 paid its assembled training-set plan ~3×;
    // guide §5: cut lineage when an intermediate is reused). The
    // input here is metadata-skinny by contract (quasi columns +
    // value), so the checkpoint is id-table-sized, never corpus text.
    var remaining = df.localCheckpoint()
    var released: Option[DataFrame] = None
    for (((w, stars), i) <- rungs.zipWithIndex) {
      val generalized = stars.foldLeft(remaining)((d, c) => d.withColumn(c, lit("*")))
      val withCell = generalized.withColumn("__cell",
        expr(s"$valueCol - pmod($valueCol, ${w}L)").cast("long"))
      val counts = withCell.groupBy((q :+ col("__cell")): _*)
        .agg(count(lit(1)).as("__n"))
      // broadcast only driver-small cell tables; the count is itself a
      // map-side-combined pass over the (checkpointed) remaining set
      val joined = withCell.join(
        if (counts.count() <= maxBroadcastCells) broadcast(counts) else counts,
        quasiCols :+ "__cell")
      val rel = joined.filter(col("__n") >= k)
        .withColumn("bucket_lo", col("__cell"))
        .withColumn("bucket_width", lit(w))
        .drop("__cell", "__n")
      released = Some(released.map(_.unionByName(rel)).getOrElse(rel))
      if (i < rungs.length - 1)
        remaining = joined.filter(col("__n") < k).drop("__cell", "__n")
          .localCheckpoint() // the sub-k tail only — keeps lineage flat
    }
    released.get
  }
}
