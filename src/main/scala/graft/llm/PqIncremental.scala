package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental PQ-codebook maintenance — the product-quantization half
  * of the q142/q143 incremental-index story (round-15 verdict item 3):
  * embeddings arrive daily, the PQ codebooks CANNOT be re-trained per
  * batch, so new vectors are encoded per subspace against the FROZEN
  * codebooks from the persisted index parquet, and a per-subspace
  * quantization-error audit compares the batch's residual against the
  * train-time stats persisted with the index — the signal that tells
  * the pipeline when the quantizer has drifted off the data and
  * re-training (q47's trainCodebooks) is actually due.
  *
  * Scale shape: the codebook table is m × k rows of sub-dim vectors
  * (KBs — broadcast); a batch explodes to m subvector rows per vector
  * (pure projection), assignment is one broadcast join + map-side
  * lexicographic argmax keyed by (vec_id, subspace) — parallelism
  * grows with the batch, the indexed BASE corpus is never re-read
  * (PqIncrementalSpec pins that on the physical plan); the audit joins
  * two m-row tables. Determinism: rounded-cosine argmax with
  * smallest-code tie-break (the q76/q142 pinned-quantizer device), so
  * the whole path is oracle-SQL-able; qerr = round9(1 − cos) is the
  * spherical quantization error, summed in DECIMAL for
  * order-independent means.
  */
object PqIncremental {

  private val D = DecimalType(30, 15)

  /** Pinned per-subspace codebooks from the first kCent base vectors
    * (the q76/q142 geometric device — SQL-recomputable, so the frozen
    * index itself has an engine-independent definition): (subspace,
    * code, cvec) with cvec = subvector `subspace` of base vector
    * `code`. Persist this once with the index; every append reads the
    * parquet, never the base corpus.
    */
  def pinnedCodebooks(base: DataFrame, dim: Int, m: Int, kCent: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    base.filter(col(idCol) < kCent)
      .select(col(idCol).as("code"), col(vecCol).cast("array<double>").as("__v"))
      .select(col("code"), posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col("__v"), j * sub + 1, lit(sub)))).as(Seq("subspace", "cvec")))
      .select(col("subspace").cast("long").as("subspace"), col("code"),
        col("cvec"))
  }

  /** Encode a batch against the FROZEN codebook table: one row per
    * (vector, subspace) — (vec_id, subspace, code, cos_sim, qerr).
    * code = argmax over the subspace's codewords of the ROUND-9
    * cosine, ties to the smallest code; qerr = round9(1 − cos_sim).
    */
  def encodeBatch(batch: DataFrame, codebooks: DataFrame, dim: Int, m: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    batch
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("__v"))
      .select(col("vec_id"), posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col("__v"), j * sub + 1, lit(sub)))).as(Seq("subspace", "sv")))
      .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
        col("sv"))
      .join(broadcast(codebooks.select(col("subspace"), col("code"), col("cvec"))),
        Seq("subspace"))
      .select(col("vec_id"), col("subspace"),
        struct(round(Similarity.cosine(col("sv"), col("cvec")), 9).as("d"),
          (-col("code")).as("nc")).as("__o"))
      .groupBy(col("vec_id"), col("subspace"))
      .agg(max(col("__o")).as("__b"))
      .select(col("vec_id"), col("subspace"), (-col("__b.nc")).as("code"),
        col("__b.d").as("cos_sim"),
        round(lit(1.0) - col("__b.d"), 9).as("qerr"))
  }

  /** Train-time residual stats persisted with the index: per subspace,
    * the member count and the DECIMAL sum of round-9 quantization
    * errors (exact, order-independent — the q101 mean discipline).
    */
  def trainStats(encoded: DataFrame): DataFrame =
    encoded.groupBy(col("subspace"))
      .agg(count(lit(1)).as("n_train"), sum(col("qerr").cast(D)).as("__sum_train"))

  /** Per-subspace drift audit: the batch's mean quantization error vs
    * the frozen train-time mean; drift = round9(mean_new − mean_train)
    * — POSITIVE drift = the batch quantizes worse than the training
    * data did, the re-train signal. FULL outer join (the q143 advice
    * fix applied from the start): a subspace absent from either side
    * keeps a 0 count and a NULL mean rather than vanishing.
    */
  def driftAudit(encodedBatch: DataFrame, stats: DataFrame): DataFrame = {
    val newStats = encodedBatch.groupBy(col("subspace"))
      .agg(count(lit(1)).as("n_new"), sum(col("qerr").cast(D)).as("__sum_new"))
    val meanT = round(col("__sum_train").cast("double") / col("n_train"), 9)
    val meanN = round(col("__sum_new").cast("double") / col("n_new"), 9)
    stats.join(newStats, Seq("subspace"), "full_outer")
      .select(col("subspace"),
        coalesce(col("n_train"), lit(0L)).as("n_train"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        meanT.as("mean_qerr_train"),
        meanN.as("mean_qerr_new"),
        round(meanN - meanT, 9).as("drift"))
  }
}
