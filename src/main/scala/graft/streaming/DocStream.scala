package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Stateless MODEL-based quality gate — the streaming twin of the
    * batch q172 scorer: every arriving document is scored by the
    * hashed linear model inside the projection (the margin folds over
    * the token array in the scan — zero state, zero shuffle at any
    * feed rate), emitting the batch scorer's exact columns
    * (`n_tokens, margin_milli, score, keep`) APPENDED to the input
    * row — every input column (`ts` included) passes through, so the
    * downstream watermark/dedup stages can follow the gate. Kept/
    * dropped routing downstream is a filter on `keep`. Stream ≡ batch
    * is DocStreamSpec-pinned.
    */
  def modelGate(docs: DataFrame): DataFrame =
    graft.llm.QualityModel.withScores(docs)

  /** Stateless LEARNED-model quality gate (the 22nd stream ≡ batch
    * twin) — the streaming twin of the batch q191 scorer: arriving
    * documents scored by the PERSISTED learned weight table shipped
    * as one torrent broadcast into the codegen'd HashedMarginNano
    * expression (an O(1) lookup per token inside the scan projection
    * — zero state, zero shuffle at any feed rate). Scorer columns
    * APPEND to the input row, so `ts` and friends survive for the
    * downstream watermark/dedup stages (the [[modelGate]] passthrough
    * contract). Pass
    * `spark.sparkContext.broadcast(QualityModel.loadWeights(
    * spark.read.parquet(modelPath)))`. Stream ≡ batch is
    * DocStreamSpec-pinned.
    */
  def learnedGate(docs: DataFrame,
                  weights: org.apache.spark.broadcast.Broadcast[graft.llm.QualityWeights]): DataFrame =
    graft.llm.QualityModel.withLearnedScores(docs, weights)

  /** Stateless LEARNED-VOCAB token billing (the 23rd stream ≡ batch
    * twin) — the batch q190 scorer streamed, so the intake path can
    * enforce token budgets with the SAME learned-merges artifact the
    * shard packer (q176) and the billing report (q190) consume:
    * arriving documents bill `n_learned_tokens` under the persisted
    * rank-ordered merge table (the [[graft.llm.Bpe.tokenCountWith]]
    * replace chain — whole-stage-codegen'd string work inside the scan
    * projection, zero state, zero shuffle at any feed rate) next to
    * the whitespace `n_ws_tokens` the fertility reports divide by.
    * Columns APPEND to the input row ([[modelGate]]'s passthrough
    * contract, so `ts` survives for downstream watermark stages). Pass
    * the collected rank-ordered merges — vocab-scale and
    * driver-bounded by the trainer's contract
    * ([[graft.llm.BpeTrain.learnMerges]]). Stream ≡ batch is
    * DocStreamSpec-pinned against the q190 projection.
    */
  def tokenBillingGate(docs: DataFrame,
                       merges: Seq[(String, String)]): DataFrame =
    docs
      .withColumn("n_learned_tokens",
        graft.llm.Bpe.tokenCountWith(merges, col("text")))
      .withColumn("n_ws_tokens", TextOps.tokenCount(col("text")).cast("long"))

  /** Stateless DSIR gate — the streaming twin of the batch q173
    * scorer: arriving documents scored by the persisted hashed-unigram
    * log-likelihood-ratio model shipped as one torrent broadcast into
    * the codegen'd fold (≤ 1024 entries by the Dsir.NumBuckets
    * contract), so the whole score computes inside the scan projection
    * — zero state, zero shuffle. Scorer columns (`n_tokens`, `score`)
    * APPEND to the input row (the [[modelGate]] passthrough contract —
    * round-18 review: the old projection dropped `ts`/`text`, so the
    * gate could only sit last in an intake chain). Pass
    * `Dsir.loadModel(spark.read.parquet(modelPath))`. Stream ≡ batch
    * is DocStreamSpec-pinned.
    */
  def dsirGate(docs: DataFrame, llrNano: Map[Long, Long]): DataFrame =
    graft.llm.Dsir.withInlineScores(docs, llrNano)

  /** The composed intake: dedup within the watermark, then gate and
    * scrub — the streaming twin of the batch pipeline's first stages.
    */
  def intake(docs: DataFrame, minQuality: Double,
             watermarkDelay: String = "1 hour"): DataFrame =
    qualityGate(dedupDocs(docs, watermarkDelay), minQuality)

  /** Incremental NEAR-dup guard — q68's corpus probe run on a live
    * feed: each arriving document's MinHash bands probe the PERSISTED
    * corpus index (`NearDup.bandIndex` / `shingleSets` — the same
    * artifact `CorpusDedup.cleanAgainst` probes batch-side), matching
    * docs are exact-Jaccard-verified against the candidate corpus
    * shingle sets, and one flag row per (doc, event window) emits when
    * the watermark closes it: `(doc_id, window_start, dup_of,
    * max_jaccard, n_matches)` — the quarantine feed a crawl pipeline
    * routes around (kept docs = feed minus flags, q68's anti-join
    * shape).
    *
    * Dataflow: signature/band expansion is STATELESS projection work
    * (the native MinHashSig/WordShingles expressions), candidates come
    * from a stream-static equi-join on (band, bucket), verification
    * from a second stream-static join on the corpus id — the doc's own
    * shingle set rides its row, so no stream-stream pairing ever
    * happens. State is only the closing aggregate's per-(doc, window)
    * row. Two deviations from the batch pass, both inherent to
    * incrementality and spec-pinned: (a) batch-batch pairs WITHIN the
    * live window are not flagged (the exact-dup stage `dedupDocs`
    * upstream and the next index refresh catch them — the static index
    * snapshot cannot grow mid-query; refresh it between
    * Trigger.AvailableNow cycles); (b) flags emit per event-time
    * window, so a doc re-sent across windows re-flags (idempotent for
    * the quarantine consumer).
    */
  /** Windowed (source, token) count table — the incremental PRODUCER
    * of q101's drift-monitor pre-aggregate: each watermark-closed
    * window emits exact token counts per (window, source, token), and
    * any ingest range's χ² drift statistic is then a batch re-agg of
    * the stored cells (integer sums merge exactly — the q59/q64
    * mergeable-pre-aggregate pattern applied to drift). The document
    * stream is tokenized once, ever; state per group is one counter,
    * bounded by watermark × vocabulary, and text never enters state.
    * DocStreamSpec pins batch-χ²-over-stream-cells ≡ q101's one-shot
    * statistic on the same corpus.
    */
  def driftCells(docs: DataFrame, windowMinutes: Int = 60,
                 watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"), col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(window(col("ts"), s"$windowMinutes minutes").as("win"),
        col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .select(col("win.start").as("window_start"), col("source"),
        col("tok"), col("c"))

  def nearDupFlags(docs: DataFrame, corpusBands: DataFrame,
                   corpusShingles: DataFrame, threshold: Double = 0.8,
                   shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                   seed: Long = 42L, watermarkDelay: String = "1 hour",
                   windowMinutes: Int = 10): DataFrame = {
    import graft.llm.NearDup
    require(numHashes % bands == 0, s"numHashes=$numHashes not divisible by bands=$bands")
    val r = numHashes / bands
    // watermark at the SOURCE: every arriving row advances event time,
    // including rows the candidate join or verify later drops — with
    // the watermark node downstream of the filter, a match-free feed
    // would never close its windows
    val banded = docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("__sh", array_distinct(TextOps.wordShingles(col("text"), shingleN)))
      .withColumn("__sig", NearDup.minhashSignature(col("__sh"), numHashes, seed))
      .filter(col("__sig").isNotNull)
      .select(col("doc_id"), col("ts"), col("__sh"),
        explode(NearDup.lshBands(col("__sig"), bands, r, seed)).as("bb"))
      .select(col("doc_id"), col("ts"), col("__sh"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // A pair colliding in several bands produces one candidate row per
    // band (a streaming pre-aggregation distinct would need its own
    // state store); the duplicate verifies are bounded by `bands` and
    // the closing aggregate dedups via collect_set, so flags are
    // per-PAIR exact.
    banded
      .join(corpusBands.select(col("__id").as("corpus_id"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .join(corpusShingles.select(col("__id").as("corpus_id"),
        col("__sh").as("__csh")), Seq("corpus_id"))
      .withColumn("jaccard", NearDup.jaccard(col("__sh"), col("__csh")))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("doc_id"), window(col("ts"), s"$windowMinutes minutes").as("win"))
      .agg(min(col("corpus_id")).as("dup_of"),
        max(col("jaccard")).as("max_jaccard"),
        size(collect_set(col("corpus_id"))).cast("long").as("n_matches"))
      .select(col("doc_id"), col("win.start").as("window_start"),
        col("dup_of"), col("max_jaccard"), col("n_matches"))
  }

  /** Streaming span-probe gate (round-16 verdict item 8) — the
    * streaming form of q162's probe half: flag each arriving document
    * that contains ANY L-gram of the PERSISTED gram index
    * (`ExactSubstr.gramTable(...).distinct` — the artifact
    * q162/q164/q166 maintain batch-side), one flag row per document.
    * The quarantine feed an ingest pipeline routes to span-cleaning
    * (`ExactSubstr.cutListIncremental` + `applyCuts`) while unflagged
    * documents pass straight through.
    *
    * Dataflow: the gram projection is STATELESS per-row work (the
    * streamed [[graft.llm.ExactSubstr.gramTable]] shape — window
    * starts explode, md5 per exploded row, same Sep + fingerprint
    * formula so stream and batch agree on what "a gram" is); hits come
    * from a stream-static LEFT SEMI join on the gram key (the index is
    * the static side — it never moves per micro-batch); one flag per
    * document within the watermark via dropDuplicatesWithinWatermark —
    * doc-keyed ID-ONLY state, no window, no document text in state.
    * Refresh the static index between Trigger.AvailableNow cycles
    * (the [[nearDupFlags]] snapshot contract).
    */
  def spanProbeFlags(docs: DataFrame, gramIndex: DataFrame, L: Int,
                     watermarkDelay: String = "1 hour"): DataFrame = {
    require(L >= 2, s"span threshold L must be >= 2 tokens, got $L")
    // gram definition comes from ExactSubstr.gramAt/gramStarts — the
    // ONE formula the persisted index was built with (round-18 review:
    // a hand-copied formula here could silently de-sync from the index
    // and return zero hits)
    val grams = docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"), TextOps.tokens(col("text")).as("__t"))
      .select(col("doc_id"), col("ts"), col("__t"),
        graft.llm.ExactSubstr.gramStarts(col("__t"), L).as("__s"))
      .select(col("doc_id"), col("ts"), col("__t"),
        explode(col("__s")).as("__p"))
      .select(col("doc_id"), col("ts"),
        graft.llm.ExactSubstr.gramAt(col("__t"), col("__p"), L).as("gram"))
    val flagged = grams
      .join(gramIndex.select(col("gram")), Seq("gram"), "left_semi")
      .select(col("doc_id"), col("ts"))
    // dropDuplicatesWithinWatermark rejects batch frames — in batch
    // mode (the spec's twin) plain dropDuplicates is the same contract
    // (per doc, every hit row carries the one source ts)
    if (flagged.isStreaming) flagged.dropDuplicatesWithinWatermark("doc_id")
    else flagged.dropDuplicates("doc_id")
  }

  /** Composed INTAKE-TO-RELEASE gate (the 21st stream ≡ batch twin) —
    * the q185 release pipeline's gating stages in the streaming
    * probe-don't-cut contract: exact-dup keep-first within the
    * watermark (arrival order stands in for q185's min-id rule on
    * closed batches), the stateless model margin gate (q172's margin
    * ≥ 0), and the span PROBE against the benchmark gram set — a doc
    * containing ANY bench L-gram routes to the batch span-cleaning
    * path ([[spanProbeFlags]]' quarantine contract; q185 cuts those
    * spans batch-side), and every hit-free survivor releases
    * IMMEDIATELY with q185's md5-anchored release row (a hit-free
    * doc's text IS its clean text, so the anchors agree with the
    * batch pipeline's by construction).
    *
    * Dataflow: the only state is the dedup stage's fp-keyed id row
    * within the watermark; everything else is scan work — the margin
    * folds in the projection, the doc's L-grams md5 inside ONE
    * `transform` (once per window position, the [[spanProbeFlags]]
    * gram shape) and probe the bench gram set through ONE codegen'd
    * [[graft.functions.AnyInBroadcastSet]] call (the set ships as a
    * torrent broadcast, not an InSet literal re-serialized per task —
    * production bench suites run to ~10⁵ grams). No stream-stream
    * join, no aggregation state. Stream ≡ batch is DocStreamSpec-
    * pinned on a planted corpus with a bench quote, a negative-margin
    * doc, and an exact duplicate.
    */
  def releaseGate(docs: DataFrame, benchGrams: Set[String], L: Int,
                  watermarkDelay: String = "1 hour"): DataFrame = {
    require(L >= 2, s"span threshold L must be >= 2 tokens, got $L")
    require(benchGrams.nonEmpty, "empty benchmark gram set")
    val bc = docs.sparkSession.sparkContext.broadcast(benchGrams)
    val fp = docs.withColumn("__fp", md5(col("text")))
    // stream: first ARRIVAL survives (watermark-bounded state); batch:
    // q185's min-id rule — a bare dropDuplicates would keep a
    // partition-order-dependent arbitrary row, so the twin pin could
    // flake. Equal on closed batches where arrival order is id order
    // (the twin contract).
    val deduped = (if (docs.isStreaming)
        fp.withWatermark("ts", watermarkDelay)
          .dropDuplicatesWithinWatermark("__fp")
      else {
        val fpc = fp.localCheckpoint() // feeds the min table AND the semi join
        fpc.join(fpc.groupBy(col("__fp"))
            .agg(min(col("doc_id")).as("doc_id")),
          Seq("__fp", "doc_id"), "left_semi")
      }).drop("__fp")
    val gated = graft.llm.QualityModel.withScores(deduped)
      .filter(col("keep"))
    gated
      .withColumn("__t", TextOps.tokens(col("text")))
      // grams via ExactSubstr.gramAt/gramStarts — the shared formula
      // (see spanProbeFlags); transform shape instead of explode, one
      // array per doc probed by the broadcast set
      .withColumn("__g",
        transform(graft.llm.ExactSubstr.gramStarts(col("__t"), L),
          p => graft.llm.ExactSubstr.gramAt(col("__t"), p, L)))
      .filter(!graft.functions.AnyInBroadcastSet(col("__g"), bc))
      .select(col("doc_id"), col("ts"), col("n_tokens"),
        col("margin_milli"),
        length(col("text")).cast("long").as("clean_len"),
        md5(col("text")).as("clean_md5"),
        pmod(conv(substring(md5(col("text")), 1, 8), 16, 10)
          .cast("long"), lit(8L)).as("shard"))
  }

  /** Streaming semantic near-dup gate (the 18th stream ≡ batch twin) —
    * [[graft.llm.Similarity.semDedupAppend]]'s corpus half on a live
    * embedding feed: each arriving vector assigns to its nearest
    * FROZEN pinned centroid and is flagged iff some corpus vector in
    * that cluster sits at rounded cosine ≥ `tau`.
    *
    * Dataflow: the assignment is STATELESS per-row work — a streaming
    * groupBy would be a state store, so the metadata-sized centroid
    * table collects to struct literals and the argmax is a `greatest`
    * over (round-9 cosine, −cid, cid) structs, the exact total order
    * of the batch device (max d, then smallest cid); mates come from a
    * stream-static join on the cluster key (corpus decision table +
    * vectors are the static side — they never move per micro-batch);
    * one flag per vector within the watermark — id-only state, no
    * window, no vectors in state. In-feed near-dups are NOT flagged
    * (q169's batch half owns those at the next index refresh — the
    * [[nearDupFlags]] snapshot contract).
    */
  def semDedupFlags(vecs: DataFrame, corpusAsg: DataFrame,
                    corpusVecs: DataFrame, centroids: DataFrame,
                    tau: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    centroidIdCol: String = "centroid_id",
                    centroidVecCol: String = "embedding",
                    watermarkDelay: String = "1 hour"): DataFrame = {
    import graft.llm.Similarity
    val cents: Seq[(Long, Seq[Double])] = centroids
      .select(col(centroidIdCol).cast("long"),
        col(centroidVecCol).cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    require(cents.nonEmpty, "centroid table is empty")
    val vecD = col(vecCol).cast("array<double>")
    val cands = cents.map { case (cid, cv) =>
      struct(round(Similarity.cosine(vecD, typedlit(cv)), 9).as("d"),
        lit(-cid).as("nc"), lit(cid).as("cid"))
    }
    val cluster =
      (if (cands.size == 1) cands.head else greatest(cands: _*))
        .getField("cid")
    val assigned = vecs
      .withWatermark("ts", watermarkDelay)
      .select(col(idCol).as("vec_id"), col("ts"), vecD.as("__v"),
        cluster.as("cluster_id"))
    val mates = corpusAsg
      .select(col("vec_id").as("__cmid"), col("cluster_id"))
      .join(corpusVecs.select(col(idCol).as("__cmid"),
        col(vecCol).cast("array<double>").as("__cv")), Seq("__cmid"))
    val flagged = assigned.join(mates, Seq("cluster_id"))
      .filter(round(Similarity.cosine(col("__v"), col("__cv")), 9) >= lit(tau))
      .select(col("vec_id"), col("ts"), col("cluster_id"))
    if (flagged.isStreaming) flagged.dropDuplicatesWithinWatermark("vec_id")
    else flagged.dropDuplicates("vec_id")
  }

  final case class QualityPoint(source: String, day: Long, n_docs: Long,
      mean_quality: Double, p50_quality: Long, junk_frac: Double)
  final case class QualityState(curDay: Long, hist: Map[Long, Long])

  /** Streaming twin of q151 (the per-source quality triage report,
    * round-15 verdict item 8): per source, the CUMULATIVE report as of
    * each closed day — doc count, exact integer-fed mean quality,
    * integer-cut median, sub-7 junk fraction — emitted live when the
    * day closes (the first strictly-later-day row for that source
    * arrives, the [[EventStream.driftTimeline]] device). State per
    * source is the quality-score histogram: scores are 0..10 integers,
    * so ELEVEN longs per source forever — document text never enters
    * state. Arithmetic mirrors the batch plan exactly: Σq·c and
    * Σ_{q<7}c over exact longs, ONE double division each (round-9),
    * median = smallest q with cum·2 ≥ n. Replay contract: per source,
    * rows arrive day-monotonically across micro-batches (the
    * driftTimeline contract); the final open day has no report yet, so
    * the stream equals the batch report series restricted to closed
    * days (DocStreamSpec pins it).
    */
  def sourceQualityTimeline(docs: DataFrame): Dataset[QualityPoint] = {
    val spark = docs.sparkSession
    import spark.implicits._
    def r9(x: Double): Double = graft.util.Round9.r9(x)
    docs
      .select(col("source"), unix_timestamp(col("ts")).as("epoch"),
        TextOps.qualityScore(col("text")).cast("long").as("q"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[QualityState, QualityPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[QualityState]) =>
          var st = state.getOption.getOrElse(QualityState(Long.MinValue, Map.empty))
          val out = Seq.newBuilder[QualityPoint]
          def report(day: Long, hist: Map[Long, Long]): QualityPoint = {
            val n = hist.values.sum
            val sq = hist.iterator.map { case (q, c) => q * c }.sum
            val junk = hist.iterator.collect { case (q, c) if q < 7 => c }.sum
            val p50 = hist.keys.toSeq.sorted
              .foldLeft((0L, Option.empty[Long])) { case ((cum, found), q) =>
                val c2 = cum + hist(q)
                (c2, found.orElse(if (c2 * 2 >= n) Some(q) else None))
              }._2.get
            QualityPoint(src, day, n, r9(sq.toDouble / n), p50,
              r9(junk.toDouble / n))
          }
          rows.map(r => (Math.floorDiv(r._2, 86400L), r._3)).toArray
            .sortBy(_._1)
            .foreach { case (day, q) =>
              if (st.curDay == Long.MinValue) st = QualityState(day, st.hist)
              else if (day > st.curDay) {
                out += report(st.curDay, st.hist)
                st = QualityState(day, st.hist)
              }
              st = st.copy(hist = st.hist.updated(q, st.hist.getOrElse(q, 0L) + 1L))
            }
          state.update(st)
          out.result().iterator
      }
  }
}
