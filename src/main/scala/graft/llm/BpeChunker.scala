package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-token-budget document chunker — the context-window packer a
  * trainer actually consumes (reference capability intent: token
  * accounting, `models/unsupervised.py:29-46` uses fixed walk lengths;
  * the LLM-pipeline mandate is the budget-billed form).
  *
  * Splits each document's whitespace word sequence into consecutive
  * chunks whose MODEL-token cost under the production broadcast-BPE
  * vocab ([[Bpe.tableTokenCount]]) stays ≤ `budget`. Greedy boundary
  * rule (the standard context packer): a word that would push the
  * running cost past the budget CLOSES the current chunk and starts a
  * new one; a single word costlier than the whole budget occupies its
  * own over-budget chunk — words are never split. Because the vocab's
  * merges never cross a word boundary, per-word costs sum exactly to
  * the document cost, so chunk costs are additive and the whole
  * operator is ONE zero-shuffle scan projection:
  *
  *   - per-word costs: the codegen'd broadcast-vocab expression
  *     applied inside `transform()` (one vocab broadcast per process,
  *     per-executor memo — q120's billing path);
  *   - greedy packing: a left fold inside `aggregate()` whose
  *     accumulator carries (closed chunks, open-chunk state) — no
  *     window, no shuffle, no driver state;
  *   - `explode` of the per-doc chunk array is the only row expansion.
  *
  * At 100 TB this is an embarrassingly parallel map over the corpus —
  * the shape chunking MUST have, because it runs on every ingest.
  * Empty documents emit nothing (q67's convention).
  */
object BpeChunker {

  /** One row per chunk: (idCol, chunk_idx, start_pos, n_words, n_bpe)
    * with `start_pos` the 1-based word position opening the chunk and
    * `n_bpe` the chunk's exact model-token cost.
    */
  def chunk(spark: SparkSession, docs: DataFrame, idCol: String,
            textCol: String, budget: Long): DataFrame = {
    require(budget >= 1, "BpeChunker: budget must be >= 1 model token")
    val toks = TextOps.tokens(col(textCol))
    val items = transform(toks, (w, i) => struct(
      (i + 1).cast("int").as("pos"),
      Bpe.tableTokenCount(spark, w).as("c")))
    val chunkT =
      "array<struct<chunk_idx:int,start_pos:int,n_words:int,n_bpe:bigint>>"
    def closed(acc: Column) = array(struct(
      acc("curIdx").as("chunk_idx"), acc("curStart").as("start_pos"),
      acc("curWords").as("n_words"), acc("curBpe").as("n_bpe")))
    val zero = struct(
      array().cast(chunkT).as("done"), lit(0).as("curIdx"),
      lit(0).as("curStart"), lit(0).as("curWords"), lit(0L).as("curBpe"))
    val packed = aggregate(items, zero,
      (acc, x) => {
        val over = acc("curWords") > 0 && acc("curBpe") + x("c") > budget
        struct(
          when(over, concat(acc("done"), closed(acc)))
            .otherwise(acc("done")).as("done"),
          when(over, acc("curIdx") + 1).otherwise(acc("curIdx")).as("curIdx"),
          when(over || acc("curWords") === 0, x("pos"))
            .otherwise(acc("curStart")).as("curStart"),
          when(over, lit(1)).otherwise(acc("curWords") + 1).as("curWords"),
          when(over, x("c")).otherwise(acc("curBpe") + x("c")).as("curBpe"))
      },
      acc => when(acc("curWords") > 0, concat(acc("done"), closed(acc)))
        .otherwise(acc("done")))
    docs.select(col(idCol), explode(packed).as("__ch"))
      .select(col(idCol), col("__ch.chunk_idx"), col("__ch.start_pos"),
        col("__ch.n_words"), col("__ch.n_bpe"))
  }
}
