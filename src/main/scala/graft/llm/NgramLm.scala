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

  /** The MERGEABLE count state a pipeline persists between batches:
    * (c2 = (w1, w2, c2) exact bigram counts, vocab = the distinct
    * unigram table). Everything downstream ([[lpTables]]) derives
    * from these two tables alone, which is what makes the model
    * incrementally maintainable ([[mergeCounts]]).
    */
  def fitCounts(corpus: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame) = {
    val c2 = bigramTable(corpus.select(lit(0L).as("__id"), col(textCol)),
        "__id", textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
    val vocab = corpus
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .distinct()
    (c2, vocab)
  }

  /** Absorb a fresh-document batch into persisted count state WITHOUT
    * re-reading the corpus (the q164/q170 index-maintenance
    * discipline): bigram counts add per (w1, w2) — batch documents
    * are new, so their transitions are disjoint observations — and
    * the vocabulary unions. `mergeCounts(fitCounts(c), b) ≡
    * fitCounts(c ∪ b)` (NgramLmSpec pins it). One tokenize pass over
    * the BATCH only.
    */
  def mergeCounts(c2Old: DataFrame, vocabOld: DataFrame, batch: DataFrame,
                  textCol: String = "text"): (DataFrame, DataFrame) = {
    val (bc2, bv) = fitCounts(batch, textCol)
    val c2 = c2Old.withColumnRenamed("__c2", "__co")
      .join(bc2.withColumnRenamed("__c2", "__cb"), Seq("w1", "w2"),
        "full_outer")
      .select(col("w1"), col("w2"),
        (coalesce(col("__co"), lit(0L)) + coalesce(col("__cb"), lit(0L)))
          .as("__c2"))
    (c2, vocabOld.unionByName(bv).distinct())
  }

  /** The three log-prob tables from count state — the ONE place ln
    * runs (in Spark; the tables persist and both engines read them).
    * `c2` should be checkpointed by the caller when it feeds both the
    * marginal re-agg and the lp output from an expensive plan.
    */
  def lpTables(c2: DataFrame, vocab: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val c1 = c2.groupBy(col("w1")).agg(sum(col("__c2")).as("__c1"))
    val v = vocab.agg(count(lit(1)).as("__v"))
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

  /** Fit the model: returns (bigramLp (w1, w2, lp), w1Lp (w1, lp_u),
    * stats (v, lp0)) — the three tables an ingest pipeline persists.
    * Built as PLANS (no driver action); `localCheckpoint` keeps the
    * bigram counts from re-tokenizing for their two consumers.
    */
  def fit(corpus: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, DataFrame) = {
    val (c2, vocab) = fitCounts(corpus, textCol)
    lpTables(c2.localCheckpoint(), vocab)
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
