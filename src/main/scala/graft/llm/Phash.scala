package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image hash over the RealDecoder block-luminance raster
  * (Multimodal.RealDecoder, grid 8 → 64 cells): the classic aHash —
  * bit i set iff cell i is brighter than the raster mean — made
  * EXACTLY recomputable by any engine:
  *
  *   - cells quantize to integers first (round(x · 10⁶) — float→double
  *     widening is exact, ×10⁶ and half-up rounding are IEEE-identical
  *     in Spark and DuckDB), so the brightness comparison is
  *     64·qᵢ > Σqⱼ — pure BIGINT arithmetic, no division, no float
  *     boundary to disagree on;
  *   - the signature takes cells 0..59 as bits (60 of the 64, the q78
  *     convention: 60 = 4 blocks × 15 bits keeps shifts clear of the
  *     sign bit in both engines) while the mean sum Σ runs over ALL 64
  *     cells.
  *
  * Near-dup pairs then reuse the q78 pigeonhole machinery verbatim
  * (NearDup.signaturePairs): Hamming ≤ 3 ⇒ equality on ≥ 1 of the 4
  * 15-bit blocks, so the candidate join is an equi-join on (block,
  * value), never all-pairs — at 100 TB of images the shuffle is keyed
  * on 15-bit block values, O(n) candidates on non-adversarial data.
  *
  * Everything here is builtin expressions (transform/aggregate/
  * shiftleft) — whole-stage codegen, no UDF.
  */
object Phash {

  val SigBits = 60

  /** (idCol, sig BIGINT) from a decoded raster — `featureCol` is the
    * ArrayType(FloatType) 64-cell block-luminance raster.
    */
  def sig60(decoded: DataFrame, idCol: String, featureCol: String): DataFrame =
    decoded
      .withColumn("__qarr", expr(
        s"transform($featureCol, x -> cast(round(cast(x as double) * 1000000) as bigint))"))
      .withColumn("__stot", expr("aggregate(__qarr, 0L, (a, x) -> a + x)"))
      .select(col(idCol), expr(
        s"aggregate(transform(sequence(0, ${SigBits - 1}), " +
          "i -> IF(__qarr[i] * 64 > __stot, shiftleft(1L, i), 0L)), " +
          "0L, (a, x) -> a | x)").as("sig"))

  /** Exact Hamming ≤ maxDist pHash pair set: signature scan + blocked
    * self-join. Output (id_a, id_b, hamming). Any radius works — the
    * pigeonhole splits into maxDist + 1 near-equal blocks (e.g.
    * radius 6 → 7 blocks of 9/9/9/9/8/8/8 bits), trading per-block
    * selectivity for recall radius (multi-index Hamming; see
    * NearDup.simhashPairsOf). PhashNearDupSpec pins planted radius-5
    * twins found at maxDist = 6 with the candidate set still blocked.
    */
  def pairs(decoded: DataFrame, idCol: String, featureCol: String,
            maxDist: Int = 3): DataFrame =
    NearDup.signaturePairs(sig60(decoded, idCol, featureCol), idCol, "sig",
      maxDist, SigBits)
}
