package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed linear quality-model INFERENCE — the fasttext-style
  * model-based filter stage of an LLM data pipeline (the step after
  * TextOps.qualityScore's hand heuristics): each token hashes into one
  * of [[NumBuckets]] feature buckets (the hashing trick), the model is
  * a weight per bucket, and a document's score is the mean per-token
  * margin; the gate keeps documents with non-negative margin.
  *
  * Scale shape: inference is a PURE SCAN PROJECTION — the bucket hash,
  * weight lookup and margin fold all run inside `transform`/`aggregate`
  * higher-order functions over the token array, so scoring 100 TB is
  * embarrassingly parallel map work with ZERO shuffles and nothing
  * collected. (Contrast with a per-token explode + weight-table join:
  * that pays a corpus-token-scale shuffle for the doc re-aggregation.)
  *
  * Two weight sources, one pipeline shape: [[scoreDocs]] uses the
  * deterministic hash-derived stand-in [[weightMilli]] (milli-unit
  * integers, exactly recomputable by any engine with md5 — the
  * q95/q78 md5-twin device, so scoring is oracle-exact with no model
  * artifact at all), and [[scoreDocsLearned]] uses a REAL fitted
  * table ([[fitWeights]], the fasttext-recipe multinomial-NB
  * log-ratios) shipped the `functions.BpeTableCount` way — one
  * torrent broadcast + a codegen'd O(1) lookup
  * ([[graft.functions.HashedMarginNano]]).
  *
  * Determinism: the margin is an exact integer (milli-unit long sum);
  * the per-token mean is ONE double division of identical operands
  * (margin / (1000·n)) rounded to 9 — bit-equal across engines.
  */
object QualityModel {

  /** Feature-space width of the hashing trick. Fixed contract — part
    * of the model artifact, not a tunable (the oracle SQL bakes it in).
    */
  val NumBuckets = 4096

  /** Token → feature bucket: the first 8 md5 hex chars as an integer,
    * mod [[NumBuckets]] — non-negative, engine-reproducible.
    */
  def bucket(tok: Column): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(NumBuckets.toLong))

  /** Deterministic stand-in weight for a bucket, in milli-units:
    * ((b · 2654435761) mod 1000003) mod 2001 − 1000 ∈ [−1000, 1000].
    * Every intermediate is non-negative and < 2^63, so `%` and `pmod`
    * agree and both engines reproduce it in BIGINT arithmetic.
    */
  def weightMilli(b: Column): Column =
    pmod(pmod(b * lit(2654435761L), lit(1000003L)), lit(2001L)) - lit(1000L)

  /** Per-document margin in milli-units: Σ_tokens w(bucket(token)) —
    * one fold over the token array, zero shuffles.
    */
  def marginMilli(text: Column): Column =
    aggregate(
      transform(TextOps.tokens(text), t => weightMilli(bucket(t))),
      lit(0L), (acc, w) => acc + w)

  /** LEARNED weights — the fasttext-recipe FIT (multinomial Naive
    * Bayes over the same hashed buckets, add-one smoothed): per-bucket
    * log-ratio of the TARGET slice (the reference corpus — here the
    * heuristically-clean slice, the classic CCNet/fasttext bootstrap
    * where the hand heuristics label the seed) against the RAW corpus.
    * Exactly [[Dsir.llrTableOver]] at this model's [[NumBuckets]]
    * width: two metadata-sized bucket-count aggregates, one ln pass,
    * persisted by the caller (the ln-hazard fixture device). Output:
    * (bucket, llr) — round-9, so nano units recover exactly.
    */
  def fitWeights(target: DataFrame, raw: DataFrame,
                 textCol: String = "text"): DataFrame =
    Dsir.llrTableOver(target, raw, textCol, bucket, NumBuckets)

  /** The learned model's SUFFICIENT STATISTIC — per-bucket token
    * counts of both classes: (bucket, ct, cr). Every token lands in
    * exactly one bucket, so the class token totals are Σct / Σcr and
    * this table alone re-derives [[fitWeights]]' llr exactly
    * ([[llrFromCounts]], QualityModelSpec-pinned). Counts are exact
    * integers, so ingest batches absorb by ADDITION ([[mergeCounts]])
    * — the index-maintenance discipline (gram/band/IVF/PQ/BM25/
    * SemDeDup/df/LM) applied to this artifact: persist the counts,
    * not just the log-ratios.
    */
  def fitCounts(target: DataFrame, raw: DataFrame,
                textCol: String = "text"): DataFrame =
    Dsir.bucketCountsOver(target, textCol, bucket)
      .withColumnRenamed("c", "__ct")
      .join(Dsir.bucketCountsOver(raw, textCol, bucket)
        .withColumnRenamed("c", "__cr"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("__ct"), lit(0L)).as("ct"),
        coalesce(col("__cr"), lit(0L)).as("cr"))

  /** Absorb an ingest batch into a persisted [[fitCounts]] table —
    * counts ADD per bucket, vocabularies union; the base corpus is
    * never re-read. mergeCounts(fitCounts(t₁,r₁), t₂, r₂) ≡
    * fitCounts(t₁∪t₂, r₁∪r₂) (QualityModelSpec-pinned).
    */
  def mergeCounts(base: DataFrame, batchTarget: DataFrame,
                  batchRaw: DataFrame, textCol: String = "text"): DataFrame =
    base.unionByName(fitCounts(batchTarget, batchRaw, textCol))
      .groupBy(col("bucket"))
      .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr"))

  /** Re-derive the (bucket, llr) weight table from a [[fitCounts]]
    * state — one ln pass over the ≤ [[NumBuckets]]-row table
    * (bit-equal to [[fitWeights]] over the same corpora; the caller
    * persists the result, the ln-hazard fixture device).
    */
  def llrFromCounts(counts: DataFrame): DataFrame = {
    val d = NumBuckets.toDouble
    counts
      .crossJoin(counts.agg(
        coalesce(sum(col("ct")), lit(0L)).as("__nt"),
        coalesce(sum(col("cr")), lit(0L)).as("__nr")))
      .select(col("bucket"),
        round(
          log((col("ct") + 1L).cast("double") /
            (col("__nt").cast("double") + d)) -
          log((col("cr") + 1L).cast("double") /
            (col("__nr").cast("double") + d)), 9).as("llr"))
  }

  /** Load a persisted [[fitWeights]] table into executor-ready dense
    * form (nano-unit long per bucket, absent = 0) — KB-bounded by the
    * [[NumBuckets]] contract (the sanctioned driver-side collect).
    */
  def loadWeights(weights: DataFrame): QualityWeights = {
    val arr = new Array[Long](NumBuckets)
    weights.select(col("bucket"),
        round(col("llr") * 1e9, 0).cast("long").as("__nano"))
      .collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    new QualityWeights(arr)
  }

  /** Append the LEARNED scorer columns (`n_tokens, margin_nano,
    * score, keep`) to `docs`, PRESERVING every input column — the
    * passthrough form the streaming gate needs ([[withScores]]'
    * learned sibling, the ONE formula source for
    * [[scoreDocsLearned]]): the stand-in weight fold is replaced by
    * ONE codegen'd [[graft.functions.HashedMarginNano]] call (O(1)
    * array lookup per token against the torrent-broadcast table).
    * score = round9(margin_nano / (10⁹·n_tokens)) — the mean
    * per-token log-ratio; keep ⇔ margin_nano ≥ 0 (empty docs score 0
    * and pass, the [[scoreDocs]] convention).
    */
  def withLearnedScores(docs: DataFrame,
                        weights: org.apache.spark.broadcast.Broadcast[QualityWeights],
                        textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens", TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("margin_nano",
        graft.functions.HashedMarginNano(TextOps.tokens(col(textCol)),
          weights))
      .withColumn("score",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("margin_nano").cast("double") /
            (col("n_tokens").cast("double") * 1e9), 9)))
      .withColumn("keep", col("margin_nano") >= 0)

  /** Score + gate every document under a LEARNED broadcast model:
    * (id, n_tokens, margin_nano, score, keep) —
    * [[withLearnedScores]] projected to the batch contract columns.
    */
  def scoreDocsLearned(docs: DataFrame,
                       weights: org.apache.spark.broadcast.Broadcast[QualityWeights],
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    withLearnedScores(docs, weights, textCol)
      .select(col(idCol), col("n_tokens"), col("margin_nano"),
        col("score"), col("keep"))

  /** Append the scorer columns (`n_tokens, margin_milli, score, keep`)
    * to `docs`, PRESERVING every input column — the passthrough form a
    * streaming gate needs (`ts` and friends must survive for the
    * downstream watermark/dedup stages). score = round9(margin /
    * (1000·n_tokens)) — the mean per-token weight; keep ⇔ margin ≥ 0
    * (empty docs score 0 and pass; a length gate is a different
    * operator's job). The ONE formula source — [[scoreDocs]] is this
    * plus the batch projection.
    */
  def withScores(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens", TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("margin_milli", marginMilli(col(textCol)))
      .withColumn("score",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("margin_milli").cast("double") /
            (col("n_tokens").cast("double") * 1000.0), 9)))
      .withColumn("keep", col("margin_milli") >= 0)

  /** Score + gate every document: (id, n_tokens, margin_milli, score,
    * keep) — [[withScores]] projected to the batch contract columns.
    */
  def scoreDocs(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    withScores(docs, textCol)
      .select(col(idCol), col("n_tokens"), col("margin_milli"),
        col("score"), col("keep"))
}
