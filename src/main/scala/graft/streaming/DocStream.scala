package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Streaming corpus intake — the LLM-data pipeline's batch passes
  * (exact/fingerprint dedup, quality gating, PII scrubbing) run
  * INCREMENTALLY over a document stream: the same declarative
  * expressions as the batch queries (q19/q22/q24/q39), so a crawl
  * feed is cleaned as it lands instead of in nightly rewrites.
  *
  * Scale: dedup state is watermark-bounded (memory tracks the delay
  * window, not corpus history) and keyed by the 32-char fingerprint —
  * ids only, document text never enters state. The quality/PII pass is
  * stateless per-row projection work. One shuffle (the dedup key);
  * everything else is map-side.
  */
object DocStream {

  /** Fingerprint dedup within the watermark: a re-crawled or mirrored
    * document (same normalized content) arriving within
    * `watermarkDelay` of the original is dropped. The dedup key is the
    * batch pipeline's `TextOps.fingerprint` (q24's normalized md5), so
    * batch and stream agree on what "the same document" means.
    * `docs` needs an event-time column `ts`.
    */
  def dedupDocs(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("__fp", TextOps.fingerprint(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Stateless quality gate + PII scrub: keep documents whose quality
    * score clears `minQuality`, emit them with the redacted text and
    * the scores the downstream mix-sampler needs. Identical expressions
    * to the batch q22/q39 — pure projections, no state, no shuffle.
    */
  def qualityGate(docs: DataFrame, minQuality: Double): DataFrame =
    docs
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      .withColumn("text", TextOps.piiRedact(col("text")))
      .withColumn("n_tokens", TextOps.tokenCount(col("text")))

  /** The composed intake: dedup within the watermark, then gate and
    * scrub — the streaming twin of the batch pipeline's first stages.
    */
  def intake(docs: DataFrame, minQuality: Double,
             watermarkDelay: String = "1 hour"): DataFrame =
    qualityGate(dedupDocs(docs, watermarkDelay), minQuality)
}
