package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model QUALITY SCORING — the KenLM-style perplexity
  * filter of an LLM ingest pipeline: fit an add-one-smoothed bigram LM
  * on the reference corpus once, then score every incoming document by
  * its mean token-transition log-probability (higher = more like the
  * reference; the monotone equivalent of negative perplexity, kept in
  * log space so no transcendental runs at scoring time).
  *
  * Backoff contract (fixed, part of the model artifact):
  *   - bigram (w1,w2) seen in training      → lp = ln((c₂+1)/(c₁+V))
  *   - w1 seen, bigram unseen               → lp = ln(1/(c₁+V))
  *   - w1 unseen                            → lp = ln(1/V)
  * where V = training vocabulary size (distinct unigrams).
  *
  * Scale shape: fitting is the q114 bigram-count program (pairs form
  * inside the scan projection; ONE vocab²-bounded aggregate). Scoring
  * explodes the incoming batch's bigrams and joins the persisted model
  * on its VOCAB keys — shuffle joins by contract (a 100 TB reference
  * corpus's bigram table outgrows any broadcast), then one
  * map-side-combined per-doc fold.
  *
  * Determinism: ln is the cross-engine hazard, so all three log-prob
  * tables are computed ONCE in Spark, rounded to 9, and PERSISTED —
  * both engines read the same parquet (the q146 idf device) — and the
  * per-doc sums run in exact scaled-long nano-units (the BM25 device).
  */
object NgramLm {

  /** (doc, w1, w2) bigram table of a corpus — pairs form inside the
    * scan projection (the q114 device); docs with < 2 tokens emit none.
    */
  def bigramTable(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))

  /** Fit the model: returns (bigramLp (w1, w2, lp), w1Lp (w1, lp_u),
    * stats (v, lp0)) — the three tables an ingest pipeline persists.
    * Built as PLANS (no driver action); `localCheckpoint` keeps the
    * bigram counts from re-tokenizing for their two consumers.
    */
  def fit(corpus: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame) = {
    val c2 = bigramTable(corpus.select(lit(0L).as("__id"), col(textCol)),
        "__id", textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
      .localCheckpoint() // feeds the marginal re-agg AND the lp output
    val c1 = c2.groupBy(col("w1")).agg(sum(col("__c2")).as("__c1"))
    val v = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("__tok"))
      .agg(countDistinct(col("__tok")).as("__v"))
    val bigramLp = c2.join(c1, Seq("w1"))
      .crossJoin(v)
      .select(col("w1"), col("w2"),
        round(log((col("__c2") + 1L).cast("double") /
          (col("__c1") + col("__v")).cast("double")), 9).as("lp"))
    val w1Lp = c1.crossJoin(v)
      .select(col("w1"),
        round(log(lit(1.0) / (col("__c1") + col("__v")).cast("double")), 9)
          .as("lp_u"))
    val stats = v.select(col("__v").as("v"),
      round(log(lit(1.0) / col("__v").cast("double")), 9).as("lp0"))
    (bigramLp, w1Lp, stats)
  }

  /** Score a document batch under the persisted model: (id, n_bigrams,
    * avg_lp) with avg_lp = round9(Σ lp / n) (docs with < 2 tokens
    * score 0 over 0 bigrams — a length gate is a different operator).
    */
  def scoreDocs(docs: DataFrame, bigramLp: DataFrame, w1Lp: DataFrame,
                stats: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    def nano(c: Column): Column = round(c * 1e9, 0).cast("long")
    val bg = bigramTable(docs, idCol, textCol)
    val sums = bg
      .join(bigramLp.select(col("w1"), col("w2"), nano(col("lp")).as("__n2")),
        Seq("w1", "w2"), "left")
      .join(w1Lp.select(col("w1"), nano(col("lp_u")).as("__n1")),
        Seq("w1"), "left")
      .crossJoin(stats.select(nano(col("lp0")).as("__n0")))
      .select(col(idCol),
        coalesce(col("__n2"), col("__n1"), col("__n0")).as("__nano"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__nano")).as("__s"))
    docs.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNull, lit(0.0))
          .otherwise(round(col("__s").cast("double") / 1e9 / col("n_bigrams"),
            9)).as("avg_lp"))
  }
}
