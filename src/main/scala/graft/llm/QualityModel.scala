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
  * Weights here are a deterministic hash-derived stand-in (milli-unit
  * integers, exactly recomputable by any engine with md5 — the q95/q78
  * md5-twin device), which keeps scoring oracle-exact end to end. A
  * production deployment swaps [[weightMilli]] for a learned table
  * shipped the `functions.BpeTableCount` way (one torrent broadcast +
  * a codegen'd map lookup) — the pipeline shape is identical.
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

  /** Score + gate every document: (id, n_tokens, margin_milli, score,
    * keep) where score = round9(margin / (1000·n_tokens)) — the mean
    * per-token weight — and keep ⇔ margin ≥ 0 (empty docs score 0 and
    * pass; a length gate is a different operator's job).
    */
  def scoreDocs(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val n = TextOps.tokenCount(col(textCol)).cast("long")
    docs.select(col(idCol), n.as("n_tokens"),
        marginMilli(col(textCol)).as("margin_milli"))
      .select(col(idCol), col("n_tokens"), col("margin_milli"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("margin_milli").cast("double") /
            (col("n_tokens").cast("double") * 1000.0), 9)).as("score"),
        (col("margin_milli") >= 0).as("keep"))
  }
}
