package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact smallest-k selection with a scale-aware physical plan.
  *
  * `orderBy(...).limit(k)` compiles to TakeOrderedAndProject — each
  * partition's top k merge ON THE DRIVER, so driver memory is O(k).
  * Fine for fixture-scale k; at 100 TB a p=0.1 edge split asks for
  * BILLIONS of rows and the driver funnel (and `limit`'s Int cap) is
  * the bottleneck (round-2 verdict, EdgeSplitter.scala:78-79).
  *
  * The scale path keeps the result EXACT while staying distributed:
  *   1. approx-quantile the rank column → threshold t that over-covers
  *      k by the error margin; filter to candidates (rank ≤ t) — a
  *      pushdown-friendly scan, ~k(1+ε) rows survive;
  *   2. exact trim inside the candidate set: global sort (range
  *      shuffle of the ~k candidates only) + `zipWithIndex` (its
  *      per-partition offsets come from a lightweight count job) →
  *      keep global index < k. Nothing larger than a partition ever
  *      coalesces, no driver materialization.
  * Falls back to the whole input if the threshold under-covers (hash
  * ranks make that a tail event of the quantile sketch error).
  */
object TopK {

  /** Rows with the k smallest values of `rankCol` (ties broken by
    * `tieBreak`, making selection total and deterministic).
    *
    * Null semantics (pinned — both physical paths agree): rows with a
    * null `rankCol` are NOT candidates and are never returned. Without
    * the up-front filter the two paths would diverge: orderBy sorts
    * nulls first (returned as "smallest") while the threshold path's
    * `rank <= thr` comparison drops them — same input, k-dependent
    * answers.
    *
    * @param exactCutoff below this k, use plain orderBy+limit (exact,
    *   cheapest at small k); above it, threshold + distributed trim.
    */
  def smallestBy(df0: DataFrame, rankCol: String, tieBreak: Seq[String], k: Long,
                 exactCutoff: Long = 1L << 20): DataFrame = {
    require(k >= 0)
    val df = df0.filter(col(rankCol).isNotNull)
    val order: Seq[Column] = col(rankCol).asc +: tieBreak.map(col(_).asc)
    if (k == 0) df.limit(0)
    // limit() takes an Int — k above Int.MaxValue must route to the
    // distributed path no matter how high the caller set the cutoff
    else if (k <= math.min(exactCutoff, Int.MaxValue.toLong)) df.orderBy(order: _*).limit(k.toInt)
    else {
      val spark = df.sparkSession
      val n = df.count()
      if (k >= n) df
      else {
        // rank is a 64-bit hash; double rounding near 2^63 shifts the
        // threshold by ~2^11 out of 2^64 — absorbed by the 5% margin.
        val frac = math.min(1.0, k.toDouble / n * 1.05 + 0.01)
        val err = math.min(0.01, math.max(1e-6, 0.02 * k / n))
        val thr = df.select(col(rankCol).cast("double").as("__q"))
          .stat.approxQuantile("__q", Array(frac), err)(0)
        val cands = df.filter(col(rankCol).cast("double") <= lit(thr))
        val base = if (cands.count() >= k) cands else df // under-cover fallback
        val schema = base.schema
        val trimmed = base.orderBy(order: _*).rdd
          .zipWithIndex()
          .filter(_._2 < k)
          .map(_._1)
        spark.createDataFrame(trimmed, schema)
      }
    }
  }

  /** Partition-local top-k PER KEY — the exactness-preserving pre-trim
    * for "k rows per group by a total order" (deterministic hash
    * sampling, per-group leaderboards): within each INPUT partition
    * keep only the k smallest rows of every key by `orderCols`
    * (lexicographic, nulls first — Spark's ascending convention), so
    * the downstream key-partitioned window shuffles at most
    * k × partitions rows per key instead of the full input. Exact by
    * a superset argument: each global top-k row of a key is among the
    * k smallest of that key within its own partition slice, so the
    * union of partition-local top-k sets contains every global winner.
    *
    * One `mapPartitions` pass, NO shuffle; per-task memory is a
    * bounded heap per observed key — O(keys-per-partition × k) rows,
    * the classic combiner bound. Project to the key + order + carried
    * columns BEFORE calling (the heap holds whole rows).
    */
  /** Exact per-key top-k by (`scoreCol` DESC, `idCol` ASC) with the
    * bounded-heap pre-trim BELOW the key-partitioned rank window — the
    * q88 discipline packaged for the retrieval family (BM25, ANN
    * re-rank, ADC scans), where the key is a CONTRACT-BOUNDED query
    * batch: low cardinality at any corpus scale, so without the trim
    * each key's full candidate set (a posting union or probed list
    * that approaches corpus scale for common terms) sorts in ONE task.
    * After the trim the window input is ≤ k × partitions rows per key.
    *
    * Exact by [[perPartitionSmallestByKey]]'s superset argument;
    * IEEE negation is exact and maps Spark's double total order
    * (-0.0 < 0.0, same as Double.compareTo in the heap) onto itself
    * reversed, so (−score asc, id asc) ≡ (score desc, id asc) in both
    * the trim and the window. Output: the input columns + `rank` ∈
    * [1, k]. Works for integral scores too (long negation — callers
    * keep scores strictly above Long.MinValue).
    *
    * Null/NaN scores are NOT candidates and are never returned (the
    * [[smallestBy]] discipline): without the up-front filter the two
    * paths diverge — the heap's compareTo on negated doubles evicts
    * NaN first and keeps nulls first, while the window's `score desc`
    * puts NaN first and nulls last — so one NaN (e.g. the cosine of a
    * zero-norm vector, 0.0/0.0) would make results partition-dependent.
    */
  def rankedTopKDesc(scored: DataFrame, keyCol: String, scoreCol: String,
                     idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val nonNull = scored.filter(col(scoreCol).isNotNull)
    val clean = scored.schema(scoreCol).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType =>
        nonNull.filter(!isnan(col(scoreCol)))
      case _ => nonNull
    }
    val trimmed = perPartitionSmallestByKey(
      clean.withColumn("__neg", negate(col(scoreCol))),
      Seq(keyCol), Seq("__neg", idCol), k).drop("__neg")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    trimmed.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def perPartitionSmallestByKey(df: DataFrame, keyCols: Seq[String],
                                orderCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val ordIdx = orderCols.map(schema.fieldIndex)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // lexicographic on the order columns, null-first like asc sorts
    val byOrder: Ordering[org.apache.spark.sql.Row] = (a, b) => {
      var i = 0; var c = 0
      while (c == 0 && i < ordIdx.length) {
        val x = a.get(ordIdx(i)); val y = b.get(ordIdx(i))
        c = (x, y) match {
          case (null, null) => 0
          case (null, _) => -1
          case (_, null) => 1
          case (xc: Comparable[Any] @unchecked, yc) => xc.compareTo(yc)
        }
        i += 1
      }
      c
    }
    df.mapPartitions { rows =>
      // max-heap per key: head = largest kept row, evicted when a
      // smaller one arrives — size never exceeds k
      val heaps = scala.collection.mutable.HashMap
        .empty[Seq[Any], scala.collection.mutable.PriorityQueue[org.apache.spark.sql.Row]]
      rows.foreach { r =>
        val key = keyIdx.map(r.get)
        val h = heaps.getOrElseUpdate(key,
          scala.collection.mutable.PriorityQueue.empty(byOrder))
        if (h.size < k) h.enqueue(r)
        else if (byOrder.compare(r, h.head) < 0) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(enc)
  }
}
