package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * the published data-selection recipe: fit hashed-unigram bag-of-words
  * language models over a TARGET corpus (the high-quality distribution
  * you want more of) and the RAW crawl, then weight every raw document
  * by its log-likelihood ratio Σ_tokens [log p_target(b) − log p_raw(b)]
  * over the hashed feature buckets, and keep the top mass.
  *
  * Scale shape: the two bucket-count passes are map-side-combined
  * aggregates over (bucket) — [[NumBuckets]] output rows each, metadata
  * at any corpus scale. The fitted model ([[llrTable]]) is a
  * [[NumBuckets]]-row table that BROADCASTS into scoring; scoring is
  * one scan (explode → broadcast join → per-doc sum with map-side
  * combine, so the only corpus-scale shuffle carries one row per doc).
  *
  * Determinism: buckets are the md5-hex device (engine-reproducible);
  * the log-ratios are computed ONCE in Spark, rounded to 9, and
  * PERSISTED — both engines read the same parquet (ln is the
  * cross-engine hazard; the q146 idf device) — and per-doc sums run in
  * exact scaled-long nano-units (the BM25 summation device).
  */
object Dsir {

  /** Hashed feature-space width — part of the model artifact contract
    * (the oracle SQL bakes it in), not a tunable.
    */
  val NumBuckets = 1024

  /** Token → feature bucket (md5 hex-prefix mod [[NumBuckets]]). */
  def bucket(tok: Column): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"),
      lit(NumBuckets.toLong))

  /** Per-bucket token counts of a corpus: (bucket, c) — one explode +
    * one map-side-combined aggregate, ≤ [[NumBuckets]] output rows.
    */
  def bucketCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    bucketCountsOver(docs, textCol, bucket)

  /** [[bucketCounts]] generalized over the bucket function — the ONE
    * per-bucket count aggregate behind the DSIR fit, the learned
    * quality weights ([[llrTableOver]]) and their count-state
    * maintenance ([[QualityModel.fitCounts]]); a bucketing-contract
    * change lands exactly once.
    */
  def bucketCountsOver(docs: DataFrame, textCol: String,
                       bucketOf: Column => Column): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("__tok"))
      .select(bucketOf(col("__tok")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))

  /** The fitted DSIR model: (bucket, llr) for every bucket seen in
    * target ∪ raw, llr = round9( ln((c_t+1)/(N_t+D)) −
    * ln((c_r+1)/(N_r+D)) ) — add-one-smoothed hashed-unigram LMs.
    * Compute ONCE in Spark and persist; both engines read the parquet
    * (the ln-hazard fixture device). Scoring joins on bucket, so any
    * bucket absent here is absent from the raw corpus too — when the
    * scored documents come FROM the raw corpus every token hits.
    */
  def llrTable(target: DataFrame, raw: DataFrame,
               textCol: String = "text"): DataFrame =
    llrTableOver(target, raw, textCol, bucket, NumBuckets)

  /** [[llrTable]] generalized over the bucket function and feature
    * width — the SAME add-one-smoothed multinomial NB log-ratio fit
    * powers both the DSIR model (1024 buckets) and the learned
    * quality-filter weights ([[QualityModel.fitWeights]], 4096
    * buckets). One ln pass, persisted by the caller (the ln-hazard
    * fixture device).
    */
  def llrTableOver(target: DataFrame, raw: DataFrame, textCol: String,
                   bucketOf: Column => Column, width: Int): DataFrame = {
    val d = width.toDouble
    val tb = bucketCountsOver(target, textCol, bucketOf)
      .withColumnRenamed("c", "__ct")
    val rb = bucketCountsOver(raw, textCol, bucketOf)
      .withColumnRenamed("c", "__cr")
    val tn = target.select(TextOps.tokenCount(col(textCol)).cast("long").as("__n"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("__nt"))
    val rn = raw.select(TextOps.tokenCount(col(textCol)).cast("long").as("__n"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("__nr"))
    tb.join(rb, Seq("bucket"), "full_outer")
      .crossJoin(tn).crossJoin(rn)
      .select(col("bucket"),
        round(
          log((coalesce(col("__ct"), lit(0L)) + 1L).cast("double") /
            (col("__nt").cast("double") + d)) -
          log((coalesce(col("__cr"), lit(0L)) + 1L).cast("double") /
            (col("__nr").cast("double") + d)), 9).as("llr"))
  }

  /** Score every document under a persisted [[llrTable]]: (id,
    * n_tokens, score) with score = round9(Σ_tokens llr(bucket)) — the
    * sum in exact nano-units (round-9 doubles recover their integer
    * k·10⁻⁹ exactly under ×10⁹ re-rounding, so downstream consumers
    * like [[selectTopFraction]] re-derive the exact nano sum from
    * `score` alone — no internal column in the contract). Empty docs
    * score 0. The model broadcasts by contract (≤ [[NumBuckets]]
    * rows).
    */
  def scoreDocs(docs: DataFrame, llr: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("__tok"))
      .select(col(idCol), bucket(col("__tok")).as("bucket"))
    val sums = toks
      .join(broadcast(llr.select(col("bucket"),
        round(col("llr") * 1e9, 0).cast("long").as("__nano"))), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("__nano")).as("__s"))
    docs.select(col(idCol),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        round(coalesce(col("__s"), lit(0L)).cast("double") / 1e9, 9)
          .as("score"))
  }

  /** [[scoreDocs]] with the model shipped EXECUTOR-SIDE — the
    * zero-shuffle/zero-state form for a stream (or any caller that
    * can hold the ≤ [[NumBuckets]]-entry model driver-side): the
    * model densifies into a [[QualityWeights]] array (bucket = index;
    * the expression's modulus is the array length, so a
    * [[NumBuckets]]-long array reproduces [[bucket]] exactly) and one
    * torrent broadcast feeds the codegen'd
    * [[graft.functions.HashedMarginNano]] fold — O(1) per token,
    * where the pre-round-17 `typedLit` literal map paid an O(width)
    * `element_at` scan per token AND re-shipped the map with every
    * task closure. Bit-identical to [[scoreDocs]] over the same
    * persisted model (DsirSpec pins it): both sum the identical
    * nano-units. `llrNano` is the persisted table's
    * (bucket → round9(llr)·10⁹) entries.
    */
  def scoreDocsInline(docs: DataFrame, llrNano: Map[Long, Long],
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    withInlineScores(docs, llrNano, textCol)
      .select(col(idCol), col("n_tokens"), col("score"))

  /** [[scoreDocsInline]] with FULL PASSTHROUGH — the scorer columns
    * (`n_tokens`, `score`) APPEND to the input row instead of
    * projecting it away, so `ts`, `text` and friends survive for
    * downstream watermark/dedup stages (the gate-family contract
    * `QualityModel.withScores`/`withLearnedScores` established;
    * round-18 review: `DocStream.dsirGate` silently dropped every
    * input column and could only ever sit LAST in an intake chain).
    * The ONE formula source — [[scoreDocsInline]] is this plus the
    * three-column projection (the `QualityModel.withScores`/
    * `scoreDocs` discipline).
    */
  def withInlineScores(docs: DataFrame, llrNano: Map[Long, Long],
                       textCol: String = "text"): DataFrame = {
    require(llrNano.nonEmpty && llrNano.size <= NumBuckets,
      s"model must hold 1..$NumBuckets buckets, got ${llrNano.size}")
    require(llrNano.keysIterator.forall(b => b >= 0 && b < NumBuckets),
      s"bucket keys must sit in [0, $NumBuckets)")
    val arr = new Array[Long](NumBuckets)
    llrNano.foreach { case (b, v) => arr(b.toInt) = v }
    val bc = docs.sparkSession.sparkContext.broadcast(new QualityWeights(arr))
    docs
      .withColumn("n_tokens", TextOps.tokenCount(col(textCol)).cast("long"))
      .withColumn("score",
        round(graft.functions.HashedMarginNano(TextOps.tokens(col(textCol)), bc)
          .cast("double") / 1e9, 9))
  }

  /** Load a persisted [[llrTable]] into the inline-model form —
    * KB-bounded by the [[NumBuckets]] contract (the one sanctioned
    * driver-side collect in this family).
    */
  def loadModel(llr: DataFrame): Map[Long, Long] =
    llr.select(col("bucket"),
        round(col("llr") * 1e9, 0).cast("long").as("__nano"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Deterministic top-fraction selection — the resampling step with
    * the Gumbel noise replaced by the (score desc, id asc) total order
    * (seeded-sampling variants keep the identical pipeline shape; the
    * deterministic cut is the oracle-able contract): keep the
    * ⌊n / denom⌋ highest-scoring documents. The exact integer sort key
    * is re-derived from the public `score` column (round(score·10⁹) ≡
    * the original nano sum — the round-9 device), so any
    * [[scoreDocs]]-shaped frame works. The global rank runs on
    * [[graft.operators.DistributedRank.prefix]] over a constant group —
    * a bare global window would funnel the corpus through ONE sort
    * task — and the corpus total comes from prefix's own `__n` group
    * count, so the scored plan is consumed exactly ONCE (no second
    * pass, no checkpoint needed). Output: (id, rank, score) of the
    * selected documents.
    */
  def selectTopFraction(scored: DataFrame, denom: Int,
                        idCol: String = "doc_id"): DataFrame = {
    require(denom >= 1)
    val ranked = graft.operators.DistributedRank.prefix(
      scored.select(col(idCol), col("score"),
          round(col("score") * 1e9, 0).cast("long").as("__s"))
        .withColumn("__negs", -col("__s"))
        .withColumn("__all", lit(0)),
      Seq("__all"), Seq("__negs", idCol))
    // ⌊n/denom⌋ by FLOOR of one double division — both engines
    // evaluate the identical operation (the q46 slicing device);
    // `__n` is prefix's group row count = the corpus total (one group)
    ranked
      .filter(col("__rank") <=
        floor(col("__n").cast("double") / denom).cast("long"))
      .select(col(idCol), col("__rank").as("rank"), col("score"))
  }

  /** Seeded Gumbel resampling keys — the STOCHASTIC selection step the
    * published recipe actually specifies (Xie et al. 2023 resamples
    * raw documents ∝ exp(score/T); the Gumbel-top-k identity [Kool et
    * al. 2019] turns that into one deterministic rank): per document,
    *
    *   u    = (md5_32(seed # id) + 0.5) / 2^32          ∈ (0,1)
    *   gkey = round9( score/T − ln(−ln u) )
    *
    * Engine-reproducible by construction: `u` derives from the md5-hex
    * device (no RNG state, stable under repartitioning, and the ±0.5
    * centering keeps u strictly inside (0,1) so both ln calls are
    * finite — noise spans ≈ [−3.2, +22.9] at 32 bits). ln IS the
    * cross-engine hazard, so callers compute this ONCE in Spark and
    * persist (the ln-hazard fixture device); selection then ranks the
    * persisted keys. One per-row projection — no shuffle, no state.
    * |gkey| must stay below [[GumbelKeyBound]] so the round-9 nano
    * re-key in [[resampleTopFraction]] stays inside double's 2^53
    * exact-long range — ENFORCED with a loud raise_error (a silent
    * violation would flip ranks near the cut cross-engine instead of
    * pointing at the too-small temperature).
    */
  def gumbelKeys(scored: DataFrame, seed: Long, temperature: Double,
                 idCol: String = "doc_id"): DataFrame = {
    require(temperature > 0, s"gumbelKeys: temperature=$temperature")
    val u = (conv(substring(md5(concat_ws("#", lit(seed.toString),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + 0.5) /
      lit(4294967296.0)
    val raw = col("score") / temperature - log(-log(u))
    scored.select(col(idCol), col("score"),
      round(guardKeyRange(raw), 9).as("gkey"))
  }

  /** Nano-exactness bound for Gumbel keys: |gkey|·10⁹ must stay under
    * 2^53, the largest range where every long is a double — 9·10⁶
    * leaves margin. Above it the Spark and DuckDB ROUND(gkey·10⁹)
    * re-keys could disagree by 1 ulp and silently flip ranks.
    */
  val GumbelKeyBound: Double = 9.0e6

  private def guardKeyRange(key: Column): Column =
    when(abs(key) >= GumbelKeyBound,
      raise_error(concat(
        lit(s"Dsir: |gumbel key| >= $GumbelKeyBound breaks the 2^53 " +
          "nano-exact re-key contract (temperature too small for the " +
          "score scale): "), key.cast("string"))))
      .otherwise(key)

  /** Gumbel-top-⌊n/denom⌋ selection over PERSISTED [[gumbelKeys]] —
    * the stochastic twin of [[selectTopFraction]] with the identical
    * pipeline shape: exact nano re-key from the public round-9 `gkey`,
    * global rank on DistributedRank.prefix over a constant group (a
    * bare global window would funnel the corpus through ONE sort
    * task), corpus total from prefix's own `__n` (single consumption).
    * As T→0 the score term dominates the bounded noise and the
    * selected SET converges to [[selectTopFraction]]'s
    * (DsirResampleSpec pins it). Output: (id, rank, gkey).
    */
  def resampleTopFraction(keyed: DataFrame, denom: Int,
                          idCol: String = "doc_id"): DataFrame = {
    require(denom >= 1)
    // persisted keys come from anywhere — re-enforce the nano contract
    val ranked = graft.operators.DistributedRank.prefix(
      keyed.select(col(idCol), col("gkey"),
          round(guardKeyRange(col("gkey")) * 1e9, 0).cast("long").as("__g"))
        .withColumn("__negg", -col("__g"))
        .withColumn("__all", lit(0)),
      Seq("__all"), Seq("__negg", idCol))
    ranked
      .filter(col("__rank") <=
        floor(col("__n").cast("double") / denom).cast("long"))
      .select(col(idCol), col("__rank").as("rank"), col("gkey"))
  }
}
