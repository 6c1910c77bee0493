package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT per-group quantiles without sorting the world — the
  * distributed-selection algorithm that sits between q49's
  * approx_percentile (bounded error, one pass) and a full sort
  * (exact, but a global range shuffle of every row):
  *
  *   1. one scan: per-group (min, max, count) — G rows to the driver
  *      (G is the group count; driver-bounded by contract, the d×d /
  *      codebook collect class. For unbounded G use the q64 sketch
  *      family instead);
  *   2. one scan: per-(group, bin) counts over `bins` equi-width bins
  *      — ≤ G×bins rows, KB-scale; the driver walks each group's
  *      cumulative histogram to find the TARGET BIN of every
  *      requested quantile rank and the residual rank within it;
  *   3. one scan: rows falling in a target (group, bin) — expected
  *      n/bins of the input per group — get a per-(group, bin) sort
  *      (window over the small survivor set, never the full table)
  *      and the row at the residual rank is the exact answer.
  *
  * Rank semantics are percentile_disc: the q-quantile is the value at
  * row ⌈q·n⌉ of the group's ascending value order (q > 0; exact
  * integer rank arithmetic, so any engine cuts at the identical row).
  * Bin assignment uses ONE shared expression for the counting and
  * filtering scans — identical double arithmetic, so phase 2's
  * histogram and phase 3's filter can never disagree on a boundary
  * value.
  *
  * At 100 TB: three pruned scans (each pushes the group/value columns
  * only), one KB-sized histogram exchange, and a shuffle of ~n/bins
  * candidate rows — vs the full-data range exchange of orderBy. A
  * pathological bin (every row one value) still answers correctly:
  * the in-bin window sees ties and the residual rank lands on the
  * tied value.
  */
object ExactQuantile {

  /** One row per group: the exact `qs` quantiles of `valueCol`.
    *
    * @param qs  (output column name, quantile in (0, 1]) pairs
    * @param bins equi-width histogram resolution (candidate-set
    *             reduction factor; 4096 ⇒ phase 3 touches ~0.02% of
    *             rows per quantile on non-degenerate distributions)
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
               qs: Seq[(String, Double)], bins: Int = 4096): DataFrame = {
    require(groupCols.nonEmpty, "perGroup needs at least one group column")
    require(qs.nonEmpty, "no quantiles requested")
    qs.foreach { case (n, q) =>
      require(q > 0.0 && q <= 1.0, s"quantile $n=$q outside (0, 1]")
    }
    require(bins > 0, s"bins must be positive, got $bins")
    val spark = df.sparkSession
    val g = groupCols.map(col)
    val v = col("__v")

    // Null contract: null values are EXCLUDED from the order (the
    // percentile_disc convention — phase 1's count(v) already skips
    // them, so phases 2/3 must see the same filtered row set or bin
    // counts and in-bin ranks drift off the rank arithmetic). Null
    // GROUP KEYS cannot ride the equi-joins of phases 2/3 (they drop
    // rows silently, then the driver histogram lookup explodes) — fail
    // loudly up front instead, from the already-collected extent.
    //
    // Project the input to exactly (group keys, double value) before
    // the three phases (r19, guide §2.3 project early): the phase-3
    // candidate shuffle and window sort now move the skinny rows, not
    // the caller's full width. The phases still re-scan the projected
    // subtree — an eager checkpoint here was A/B'd and REJECTED: the
    // three scans are pruned columnar reads (or the caller's own
    // checkpoint), and materializing corpus-scale rows cost more than
    // it saved at every tested SF. Casting to double up front ≡
    // casting at each use (same value, one expression), so bins,
    // ranks and the picked values are unchanged.
    val base = df
      .filter(col(valueCol).cast("double").isNotNull)
      .select(g :+ col(valueCol).cast("double").as("__v"): _*)

    // phase 1: per-group extent + count (G rows, driver-bounded)
    val extent = base.groupBy(g: _*)
      .agg(min(v).as("__lo"), max(v).as("__hi"), count(v).as("__n"))
      .filter(col("__n") > 0)

    // the SHARED bin expression: [lo + i·wid, lo + (i+1)·wid), last
    // bin closed; a zero-width group (all values equal) puts every
    // row in bin 0
    def binOf(value: Column, lo: Column, hi: Column): Column = {
      val wid = (hi - lo) / bins
      when(wid === 0.0, 0)
        .otherwise(least(floor((value - lo) / wid).cast("int"), lit(bins - 1)))
    }

    val extRows = extent.collect()
    val key = (r: org.apache.spark.sql.Row) => groupCols.map(r.getAs[Any]).toVector
    extRows.foreach { er =>
      val k = key(er)
      require(!k.contains(null),
        s"ExactQuantile.perGroup: null group key (${groupCols.mkString(", ")}) = " +
          s"(${k.mkString(", ")}) — null keys cannot join the histogram phases; " +
          "filter or fill them before calling")
    }

    // phase 2: per-(group, bin) counts
    val ext = broadcast(extent)
    val binCounts = base.join(ext, groupCols)
      .groupBy(g :+ binOf(v, col("__lo"), col("__hi")).as("__bin"): _*)
      .agg(count(lit(1)).as("__c"))
      .collect()

    // driver: walk each group's cumulative histogram once per quantile
    val hist = binCounts.groupBy(key).map { case (k, rows) =>
      k -> rows.map(r => r.getAs[Int]("__bin") -> r.getAs[Long]("__c")).sortBy(_._1)
    }
    // (group key, q name, bin, residual rank within the bin)
    val targets = extRows.flatMap { er =>
      val k = key(er); val n = er.getAs[Long]("__n")
      val cum = hist(k)
      qs.map { case (name, q) =>
        val rank = math.ceil(q * n).toLong.max(1L)
        var before = 0L
        val (bin, inBinRank) = {
          val it = cum.iterator
          var res: (Int, Long) = (cum.last._1, rank - (n - cum.last._2))
          var found = false
          while (!found && it.hasNext) {
            val (b, c) = it.next()
            if (before + c >= rank) { res = (b, rank - before); found = true }
            else before += c
          }
          res
        }
        (k, name, bin, inBinRank)
      }
    }

    // phase 3: only rows in a target (group, bin) survive the filter;
    // the window sorts those survivors per (group, bin) — ~n/bins rows
    val tSchema = org.apache.spark.sql.types.StructType(
      extent.schema.fields.take(groupCols.length) ++ Seq(
        org.apache.spark.sql.types.StructField("__q", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__bin", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__rk", org.apache.spark.sql.types.LongType)))
    val tRows = targets.map { case (k, name, bin, rk) =>
      org.apache.spark.sql.Row.fromSeq(k ++ Seq(name, bin, rk))
    }
    val tDf = spark.createDataFrame(
      spark.sparkContext.parallelize(tRows.toSeq, 1), tSchema)
    val w = Window.partitionBy((g :+ col("__q")): _*).orderBy(v.asc)
    val picked = base.join(ext, groupCols)
      .withColumn("__bin", binOf(v, col("__lo"), col("__hi")))
      .join(broadcast(tDf), groupCols :+ "__bin")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === col("__rk"))
      .select(g :+ col("__q") :+ v.as("__val"): _*)

    // reshape to one row per group with a column per quantile
    picked.groupBy(g: _*)
      .pivot("__q", qs.map(_._1))
      .agg(first(col("__val")))
  }
}
