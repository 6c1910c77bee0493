package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * Everything here is a pure `Column` expression over built-in Spark
  * functions — codegen'd, pushdown-friendly, zero UDFs — so each op
  * stays inside whole-stage codegen and scales as an ordinary
  * projection: at 100 TB these are embarrassingly parallel map work
  * with no shuffle at all.
  *
  * Cross-engine determinism: every expression has an exact ANSI-SQL
  * twin runnable by the DuckDB oracle (see LlmQueries.oracleSql); the
  * regex/stopword logic is restricted to constructs both engines
  * evaluate identically (ASCII classes, global regexp_replace,
  * whitespace split).
  */
object TextOps {

  /** Whitespace tokenizer: the non-empty runs of non-whitespace, in
    * order; empty or blank text yields an empty array. Extraction
    * (`\S+`) rather than trim+split: Spark's `trim` strips only
    * ASCII 0x20, so the old split form emitted a phantom `""` token
    * for text starting with a tab/newline (and counted 1 token for
    * whitespace-only docs). `\S`/`\s` agree between Java and RE2
    * except for `\x0B` (vertical tab) — the same caveat the previous
    * split form had.
    */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Token count under the whitespace tokenizer. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segment count: runs of letters, runs of digits,
    * and single other non-space characters each count as one token —
    * the ASCII core of the GPT-2 pre-tokenizer pattern. A cheap,
    * deterministic proxy for "how many BPE tokens will this text cost".
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** English stopword list used by the quality/lang heuristics. Small
    * and fixed on purpose: it is part of the operator's contract (and
    * of the oracle SQL), not a tunable.
    */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be", "are")

  private def arrayLit(xs: Seq[String]): Column = array(xs.map(lit): _*)

  /** Count of tokens that appear in `words` (multiset count: repeated
    * stopwords count every time, as real quality filters do).
    * Evaluates as the native `functions.WordHits` (hash-set lookup per
    * token; the builtin twin below interprets a lambda per token and
    * scans the list linearly — value equality asserted in
    * TokenOpsNativeSpec).
    */
  def wordHits(toks: Column, words: Seq[String]): Column =
    graft.functions.WordHits(toks, words)

  /** Builtin-composition twin of `wordHits` — equivalence oracle. */
  def wordHitsGeneric(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(arrayLit(words), t)))

  /** Stopword ratio: stopword tokens / total tokens (0 for empty docs). */
  def stopwordRatio(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(wordHits(toks, EnglishStopwords).cast("double") / size(toks).cast("double"))

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
          / size(toks).cast("double"))

  /** ASCII punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\-]", ""))

  /** Composite quality score, integer points 0–10 — the shape real
    * LLM-corpus filters use (length band + stopword presence +
    * word-length sanity), integer-valued so the score is bit-exact
    * across engines:
    *   4·(20 ≤ tokens ≤ 1000) + 3·(stopword ratio ≥ 0.02)
    * + 3·(3 ≤ mean token len ≤ 12).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val lenOk = when(n >= 20 && n <= 1000, lit(4)).otherwise(lit(0))
    val stopOk = when(stopwordRatio(toks) >= 0.02, lit(3)).otherwise(lit(0))
    val mtl = meanTokenLen(toks)
    val wordOk = when(mtl >= 3.0 && mtl <= 12.0, lit(3)).otherwise(lit(0))
    (lenOk + stopOk + wordOk).cast("int")
  }

  /** Stopword marker lists for the language-ID heuristic. Deliberately
    * tiny: language ID by function-word hit counting is the classic
    * n-gram-free heuristic; ties break by list order (en first).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "los", "las", "es", "una", "y"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  /** Heuristic language ID: the language whose marker words hit the
    * most tokens wins; documents with zero hits in every list are
    * "und" (undetermined). Ties break by `LangMarkers` order.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, words) => lang -> wordHits(toks, words) }
    val best = greatest(scores.map(_._2): _*)
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, score)) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Canonical text normalization for fingerprinting: lowercase, strip
    * everything but ASCII alphanumerics and spaces, collapse whitespace
    * runs, trim.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Document fingerprint: md5 of the normalized text — robust to
    * case/punctuation/whitespace edits, the standard first-pass dedup
    * key after exact hashing.
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Winnowing fingerprints (the MOSS rolling-hash scheme): hash every
    * character `k`-gram of the normalized text, slide a window of `w`
    * consecutive gram hashes, keep each window's minimum, dedupe — a
    * LOCAL document sketch: any shared substring of length ≥ k+w-1
    * between two documents is guaranteed to contribute a shared
    * fingerprint, which makes it the partial-overlap detector (plagiarism
    * / quotation / near-copy regions) that whole-document hashing (q24)
    * and set-level MinHash (q27) cannot provide.
    *
    * The gram hash is pluggable (winnowing's guarantee holds for ANY
    * hash): `Md5` is the ORACLE hash — md5 hex with string ordering for
    * the window minimum, reproducible in external engines (DuckDB has
    * the same md5), which keeps the op oracle-checkable; `XxHash64` is
    * the PRODUCTION hash — one codegen'd 64-bit hash per gram instead
    * of a full md5 digest + hex encoding (measured ≥2× on sf0.1,
    * WinnowingHashSpec). Same selection scheme, same shared-substring
    * guarantee; the fingerprint VALUES differ by hash, as with any
    * winnowing implementation choice. Pure array expressions over the
    * codegen'd builtins; texts shorter than k yield no fingerprints.
    */
  def winnowingFingerprints(text: Column, k: Int, w: Int,
                            hasher: GramHasher = GramHasher.Md5): Column = {
    require(k >= 2 && w >= 1)
    // both hashes run as native one-pass expressions (gram hash +
    // monotonic-deque window minimum) — bit-identical values to the
    // generic charGramHashes/winnowSelect compositions kept below,
    // without the interpreted per-window array churn (WinnowingHashSpec
    // asserts equality and speedups for both)
    hasher match {
      case GramHasher.XxHash64 => graft.functions.WinnowHash(normalized(text), k, w)
      case GramHasher.Md5      => graft.functions.WinnowMd5(normalized(text), k, w)
    }
  }

  /** The winnowing gram-hash choice: oracle-reproducible md5 vs
    * production xxhash64 (see `winnowingFingerprints`).
    */
  sealed trait GramHasher extends Serializable {
    private[llm] def hash(gram: Column): Column
    private[llm] def elemType: String
  }
  object GramHasher {
    /** md5 hex, string-ordered minima — DuckDB-reproducible. */
    case object Md5 extends GramHasher {
      private[llm] def hash(gram: Column): Column = md5(gram)
      private[llm] def elemType: String = "string"
    }
    /** xxhash64, long-ordered minima — the at-scale default. */
    case object XxHash64 extends GramHasher {
      private[llm] def hash(gram: Column): Column = xxhash64(gram)
      private[llm] def elemType: String = "bigint"
    }
  }

  /** Gram hash of every character `k`-gram of `normText` (pass an
    * ALREADY staged/aliased normalized-text column: this expression is
    * referenced per gram, and an unstaged `normalized(...)` would
    * re-run its regexes once per position — the O(n²) lambda trap).
    */
  def charGramHashes(normText: Column, k: Int,
                     hasher: GramHasher = GramHasher.Md5): Column =
    transform(sequence(lit(1), greatest(length(normText) - (k - 1), lit(0))),
      i => hasher.hash(normText.substr(i, lit(k))))

  /** Winnowing selection over a STAGED gram-hash array column: the
    * distinct minima of every `w`-wide window (element-type ordering).
    * Fewer than `w` grams yields no fingerprints.
    */
  def winnowSelect(gramHashes: Column, w: Int,
                   hasher: GramHasher = GramHasher.Md5): Column =
    when(size(gramHashes) < w, array().cast(s"array<${hasher.elemType}>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(gramHashes) - (w - 1)),
          j => array_min(slice(gramHashes, j, lit(w))))))

  /** PII patterns shared by the detector and the redactor — ONE
    * pattern set for the whole package: these are `PiiScrub`'s
    * RE2-compatible, digit-boundary-anchored patterns (the round-15
    * fix; the old unanchored phone pattern here partially redacted
    * the tail of longer digit runs like '4155-123-4567', and the
    * streaming ingest scrub goes through this entry point).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> PiiScrub.EmailRe,
    "phone" -> PiiScrub.PhoneRe,
    "ipv4"  -> PiiScrub.IpRe)

  /** Occurrences of one PII pattern class in `text`. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact every occurrence of all PII classes with `[CLASS]` tags —
    * the standard pre-training scrub pass. Order matters (emails before
    * phones, so digits inside an already-redacted email aren't
    * re-matched); pure codegen'd regex projection, zero shuffle.
    */
  def piiRedact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"[${name.toUpperCase}]")
    }

  /** Word n-gram shingles over the whitespace tokens; fewer than `n`
    * tokens yields an empty array. Building block for MinHash and for
    * repetition scoring. The tokenizer stays the builtin codegen'd
    * `split`; the shingle assembly evaluates as the native
    * `functions.WordShingles` — one pass concatenating n consecutive
    * tokens per position (the builtin twin below allocates n sliced
    * arrays plus a zip-struct per position; value equality asserted in
    * TokenOpsNativeSpec).
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.WordShingles(tokens(text), n)

  /** Builtin-composition twin of `wordShingles` — equivalence oracle.
    *
    * Implementation note (perf): shingles are built by zipping `n`
    * shifted slices of the token array and joining each row of the zip.
    * The naive form — `transform(sequence(...), i -> slice(toks, i+1,
    * n))` — embeds the tokenizer inside the lambda, which Spark
    * re-evaluates PER ELEMENT: O(tokens²) regex splits per row (10.6 s
    * for 5 k docs at sf0.1). The zip form evaluates the tokenizer n
    * times per ROW; the native form, once.
    */
  def wordShinglesGeneric(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val m = size(toks) - (n - 1) // shingle count when positive
    when(m <= 0, array().cast("array<string>"))
      .otherwise(
        transform(
          arrays_zip((0 until n).map(j => slice(toks, lit(j + 1), m).as(s"s$j")): _*),
          s => concat_ws(" ", (0 until n).map(j => s.getField(s"s$j")): _*)))
  }

  /** Duplicated n-gram fraction: 1 − distinct/total shingles — the
    * standard intra-document repetition signal (0 = no repetition;
    * docs shorter than n tokens score 0).
    */
  def repetitionScore(text: Column, n: Int): Column = {
    val sh = wordShingles(text, n)
    when(size(sh) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
  }

  /** 64-bit rolling-hash content fingerprint: xxhash64 folded over the
    * word 3-gram shingles (order-independent min — so it is stable
    * under partitioning) — a cheap locality-free content id.
    */
  def rollingFingerprint(text: Column, n: Int = 3, seed: Long = 42L): Column = {
    val sh = wordShingles(text, n)
    when(size(sh) === 0, xxhash64(lit(seed), normalized(text)))
      .otherwise(array_min(transform(sh, s => xxhash64(lit(seed), s))))
  }

  /** C4/CCNet-style boilerplate-line removal: a LINE that occurs in
    * more than `maxDfFraction` of all documents (nav bars, cookie
    * banners, "all rights reserved" footers) is boilerplate; report per
    * document how many of its lines survive. Returns
    * `(idCol, n_lines, n_kept)`.
    *
    * Scale shape: lines travel as md5 HASHES, never raw text — the
    * document-frequency aggregation shuffles (hash, id) pairs only; the
    * boilerplate set (distinct lines above the bar — tiny by
    * definition) broadcasts back for the per-doc count. Two keyed
    * shuffles, no pair space, no text movement.
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       maxDfFraction: Double): DataFrame = {
    val lines = docs
      .select(col(idCol), explode(split(col(textCol), "\n")).as("__l"))
      .select(col(idCol), md5(col("__l")).as("__lh"))
    val total = docs.select(count(lit(1)).as("__total"))
    val boiler = lines
      .groupBy(col("__lh"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .crossJoin(broadcast(total))
      .filter(col("__df").cast("double") >
        lit(maxDfFraction) * col("__total").cast("double"))
      .select(col("__lh"), lit(1).as("__isb"))
    lines
      .join(broadcast(boiler), Seq("__lh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__isb").isNull, 1L).otherwise(0L)).as("n_kept"))
  }

  /** Deterministic stratified corpus subsampling — the data-mixing pass
    * that rebalances a corpus (e.g. cap the dominant language, keep
    * most of the rare ones). A doc is kept iff the HEX PREFIX of its
    * content hash is below the stratum's bound: `md5` renders the same
    * lowercase hex in every engine, so string comparison against a
    * 2-hex-digit bound ("40" keeps 64/256 ≈ 25%) is an exact,
    * engine-reproducible, seedless coin — no RNG state, no numeric hex
    * parsing. Zero shuffle: a pure projection + filter that pushes into
    * the scan.
    *
    * @param bounds stratum value → 2-hex-digit bound; docs in strata
    *   absent from the map are dropped
    */
  def stratifiedSample(docs: DataFrame, textCol: String, stratumCol: String,
                       bounds: Map[String, String]): DataFrame = {
    require(bounds.values.forall(_.matches("[0-9a-f]{2}")),
      "bounds must be 2-char lowercase hex")
    val bound = bounds.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.filter(substring(md5(col(textCol)), 1, 2) < bound)
  }

  /** Sliding-window token chunking — the RAG / long-document
    * preprocessing twin of [[packSequences]]: where packing
    * concatenates documents ACROSS boundaries into fixed windows,
    * chunking splits each document WITHIN itself into `size`-token
    * windows overlapping by `overlap` tokens (stride = size − overlap),
    * the standard shape for embedding long documents or building
    * retrieval passages. Returns
    * `(idCol, chunk_idx, n_tokens, chunk_text)` — the last chunk may
    * be short (n_tokens < size); empty documents emit no chunks.
    *
    * Scale: a pure zero-shuffle projection (tokenize once per row,
    * explode the chunk starts, slice) — chunk count multiplies rows
    * but the slices partition the tokens, so output bytes ≈ input
    * bytes × (1 + overlap/stride). Deterministic, hence
    * oracle-checkable (q67).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  size: Int, overlap: Int): DataFrame = {
    require(size >= 1, "chunk size must be positive")
    require(overlap >= 0 && overlap < size,
      s"overlap=$overlap must be in [0, size=$size)")
    val step = size - overlap
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0),
          floor((col("__n") - 1) / lit(step)).cast("int"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        least(lit(size), col("__n") - col("chunk_idx") * step).cast("int")
          .as("n_tokens"),
        array_join(slice(col("__toks"), col("chunk_idx") * lit(step) + 1,
          lit(size)), " ").as("chunk_text"))
  }

  /** Sequence packing — the pre-training step that concatenates the
    * corpus in a fixed document order and slices it into fixed-size
    * context windows: each document's tokens start at the running
    * offset of everything before it. Returns
    * `(idCol, n_tokens, window_start, n_windows)` — which context
    * window the doc starts in and how many windows it spans.
    *
    * Scale shape — the TWO-PASS DISTRIBUTED PREFIX SUM (a naive global
    * `Window.orderBy` funnels the whole corpus through ONE task):
    *  1. range-partition `(id, n_tokens)` by the pack order into
    *     `numShards` order-disjoint shards and materialize them
    *     (`localCheckpoint`, so both passes read the SAME partition
    *     assignment — no replay of the range sampler);
    *  2. pass 1: per-shard token totals — ONE row per shard, collected
    *     to the driver and cumulated into exclusive base offsets
    *     (`numShards` longs, driver-sized at any corpus size);
    *  3. pass 2: per-shard running sum (`Window.partitionBy(shard)` —
    *     every shard is an independent window task) plus the broadcast
    *     base offset.
    * No stage touches more than one shard of the corpus; the only
    * shuffled payload is `(id, n_tokens)` pairs. The checkpoint holds
    * 16 bytes/doc — at 10^10 docs that is ~160 GB cluster-wide, an
    * ordinary MEMORY_AND_DISK cache.
    *
    * @param numShards range shards (0 = the session's shuffle
    *   parallelism); each shard's rows must fit one window task
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    windowTokens: Int, numShards: Int = 0,
                    tokenCounter: Column => Column = tokenCount): DataFrame = {
    require(windowTokens >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val shards =
      if (numShards > 0) numShards
      else spark.sessionState.conf.numShufflePartitions
    // explicit shard count: AQE never coalesces a user-pinned
    // repartition, so __part is stable across the checkpoint's lifetime
    val ranged = docs
      .select(col(idCol), tokenCounter(col(textCol)).cast("long").as("n_tokens"))
      .repartitionByRange(shards, col(idCol))
      .withColumn("__part", spark_partition_id())
      .localCheckpoint()
    // pass 1: one (shard, token-total) row per shard — driver-sized
    val partials = ranged
      .groupBy(col("__part")).agg(sum(col("n_tokens")).as("__s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var running = 0L
    val bases = partials.map { case (p, s) =>
      val b = running; running += s; (p, b)
    }
    val baseDf = bases.toSeq.toDF("__part", "__base")
    // pass 2: per-shard prefix sum (window keyed by shard — parallel
    // across shards) + the broadcast exclusive base offset
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__part")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    ranged
      .join(broadcast(baseDf), Seq("__part"))
      .withColumn("__off",
        col("__base") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("n_tokens"),
        floor(col("__off") / windowTokens).as("window_start"),
        when(col("n_tokens") === 0, lit(1L))
          .otherwise(floor((col("__off") + col("n_tokens") - 1) / windowTokens)
            - floor(col("__off") / windowTokens) + 1).as("n_windows"))
  }
}
