package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-rule TRAINING — the tokenizer-build step of a
  * training-data pipeline (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"). Closes the gap
  * [[Bpe]] documents at its `TableMerges` tier: that table is a
  * deterministic SYNTHETIC vocab exercising the 50k-scale broadcast
  * encoder; this object LEARNS merges from raw corpus text.
  *
  * Shape, and why it scales: classic BPE trains on the word-frequency
  * DICTIONARY, not the corpus — [[wordCounts]] is the single
  * corpus-sized pass (one map-side-combinable hash aggregation), and
  * the K-round greedy loop touches only that vocab-scale table. At
  * 100 TB the dictionary is heavy-tail bounded (frequency-floor it
  * with `minCount` if unbounded user-generated text pushes it up);
  * each round is one distributed pair-count over the dictionary plus
  * a 1-row argmax collect — K bounded jobs, never a corpus rescan.
  *
  * Determinism (cross-engine, the oracle re-derives the merges in
  * DuckDB): pure integer pair counts; argmax tie-break is
  * (count DESC, left ASC, right ASC) under binary string order —
  * identical in Spark (UTF8 binary) and DuckDB (memcmp). Pair
  * extraction and merge application use [[Bpe]]'s delimited
  * `|a||b|` → `|ab|` replace device, so "count adjacent occurrences,
  * then left-to-right non-overlapping replace" means the same thing
  * in both engines.
  *
  * Learned tables are CONSISTENT by construction (each operand is a
  * base char or the output of an earlier merge — it was a live symbol
  * when selected), so [[Bpe.symbolsWith]]'s one-ascending-pass replay
  * is exactly greedy lowest-rank-first encoding (the theorem
  * [[BpeVocab]] documents).
  */
object BpeTrain {

  /** One learned merge: 0-based rank, operands, and the pair count
    * that won the argmax at selection time (the training evidence the
    * governance queries report).
    */
  final case class LearnedMerge(rank: Long, a: String, b: String, cnt: Long)

  /** The word-frequency dictionary: (word, cnt), one corpus pass.
    * Same corpus contract as [[Bpe.symbols]]: reserved delimiter
    * chars `|` / `#` fail loudly.
    */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val guarded = when(text.rlike("[|#]"),
      raise_error(concat(lit("BpeTrain: text contains reserved delimiter | or #: "), text)))
      .otherwise(text)
    docs.select(explode(TextOps.tokens(guarded)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
  }

  /** Additive merge of two word-frequency dictionaries — the
    * SUFFICIENT-STATISTIC maintenance of the tokenizer trainer
    * (the index-maintenance discipline applied to [[wordCounts]]):
    * counts add, vocabularies union, the base corpus is never
    * re-read. A tokenizer refresh after an ingest batch is
    * mergeDicts + [[learnMerges]] over the vocab-scale dictionary
    * alone. mergeDicts(wordCounts(a), wordCounts(b)) ≡
    * wordCounts(a ∪ b) (BpeTrainSpec-pinned).
    */
  def mergeDicts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))

  /** Adjacent symbol pairs of the dictionary under `merges`, weighted
    * by word count: (a, b, c). One distributed pass over the
    * dictionary — the per-round statistic of the greedy loop, exposed
    * for specs.
    */
  def pairCounts(wordCounts: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val sym = Bpe.symbolsOfWord(merges, col("word"))
    wordCounts
      .withColumn("syms", split(sym.substr(lit(2), length(sym) - 2), "\\|\\|"))
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> named_struct('a', syms[i-1], 'b', syms[i]))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** Learn up to `k` merges greedily from a (word, cnt) dictionary.
    * Stops early when no adjacent pair remains. The dictionary is
    * localCheckpointed once (consumed k times); each round re-derives
    * the current symbol strings by folding the merges learned so far
    * into the projection (k ≤ a few dozen — re-deriving beats k
    * checkpoint writes).
    */
  def learnMerges(wordCounts: DataFrame, k: Int): Seq[LearnedMerge] = {
    require(k >= 1, s"learnMerges: k=$k")
    val wc = wordCounts.localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[LearnedMerge]
    var exhausted = false
    while (out.length < k && !exhausted) {
      val top = pairCounts(wc, out.toSeq.map(m => (m.a, m.b)))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else out += LearnedMerge(out.length.toLong,
        top(0).getString(0), top(0).getString(1), top(0).getLong(2))
    }
    out.toSeq
  }
}
