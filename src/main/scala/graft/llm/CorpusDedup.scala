package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition an LLM data pipeline
  * actually runs before training: exact dedup, then fuzzy near-dup
  * group dedup, returning the KEPT rows of the input.
  *
  * Stage 1 (exact): content-hash keep-first (`md5(text)` groups, min
  * id wins) — one hash-keyed shuffle, removes byte-identical copies
  * so the LSH stage only ever sees one representative per exact class
  * (the skew guard NearDup documents).
  * Stage 2 (fuzzy): MinHash-LSH candidates, exact-Jaccard verified,
  * GraphX connected components over the verified pair graph — every
  * group keeps its minimum id, the rest drop.
  *
  * Scale shape: stage 1 shuffles (hash, id) pairs; stage 2 is the
  * proven q27/q36 pipeline (ids-only bucket join, O(candidates)
  * verification, CC over the near-dup pair graph only); the final
  * keep-filter is two id-keyed semi/anti joins. Nothing here ever
  * materializes a pair space or moves document text except the one
  * verification join.
  */
object CorpusDedup {

  /** Kept rows of `df` after exact + near-dup dedup (all original
    * columns preserved).
    */
  def clean(df: DataFrame, idCol: String, textCol: String,
            threshold: Double = 0.8, shingleN: Int = 3,
            numHashes: Int = 64, bands: Int = 16,
            seed: Long = 42L): DataFrame = {
    // stage 1: exact content dedup, min id per hash class
    val keepExact = df
      .select(col(idCol), md5(col(textCol)).as("__h"))
      .groupBy(col("__h")).agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val kept = df.join(keepExact, Seq(idCol), "left_semi")
    // stage 2: near-dup groups over the exact-kept set; drop everything
    // that is not its group's minimum id
    val drop = NearDup
      .nearDupGroups(kept, idCol, textCol, threshold, shingleN, numHashes, bands, seed)
      .filter(col("id") =!= col("keep_id"))
      .select(col("id").as(idCol))
    kept.join(drop, Seq(idCol), "left_anti")
  }

  /** Benchmark decontamination — the n-gram overlap scan every
    * pre-training pipeline runs against its eval sets (the GPT-3-style
    * 13-gram check, n configurable): a training doc is contaminated if
    * it shares any word n-gram with any benchmark doc. Returns
    * `(idCol, n_overlap_grams)` for contaminated training docs only —
    * anti-join the result to scrub, or inspect the counts to audit.
    *
    * Scale shape: both sides explode to (id, gram) rows; the benchmark
    * side collapses to DISTINCT grams (benchmarks are tiny next to the
    * corpus, so the distinct set broadcasts or hash-joins cheaply);
    * the join is keyed on the gram itself — exact, engine-reproducible
    * — and only matching grams reach the per-doc count. Nothing ever
    * pairs docs with docs.
    */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String, n: Int = 13): DataFrame = {
    val benchGrams = bench
      .select(explode(TextOps.wordShingles(col(textCol), n)).as("__gram"))
      .distinct()
    train
      .select(col(idCol), explode(TextOps.wordShingles(col(textCol), n)).as("__gram"))
      .join(benchGrams, Seq("__gram"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("__gram")).as("n_overlap_grams"))
  }

  /** Scale variant of [[decontaminate]] for when the benchmark's
    * distinct gram set is too big to broadcast as exact strings (many
    * eval suites × long n-grams): a bloom filter over `xxhash64` of
    * the grams (~1.2 MB per million grams at 1% fpp) rides the probe
    * expression to every executor, and train grams that cannot overlap
    * die INSIDE the codegen'd scan stage — the exact gram join that
    * follows (it removes bloom false positives; false negatives are
    * impossible) sees ~overlaps + fpp × |corpus grams| rows instead of
    * every gram of the corpus. Output is IDENTICAL to
    * [[decontaminate]] — DecontaminateBloomSpec asserts it.
    */
  def decontaminateBloom(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String, n: Int = 13,
                         fpp: Double = 0.01): DataFrame = {
    val benchGrams = bench
      .select(explode(TextOps.wordShingles(col(textCol), n)).as("__gram"))
      .distinct()
    graft.operators.BloomJoin.inner(
        train.select(col(idCol),
          explode(TextOps.wordShingles(col(textCol), n)).as("__gram")),
        benchGrams, Seq("__gram"), fpp = fpp)
      .groupBy(col(idCol))
      .agg(countDistinct(col("__gram")).as("n_overlap_grams"))
  }
}
