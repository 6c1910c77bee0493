package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson & Spärck Jones / Okapi BM25) — the
  * lexical retriever a RAG pipeline runs next to the embedding ANN
  * family: score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
  * (tf(t,d) + k1·(1 − b + b·|d|/avgdl)).
  *
  * Scale shape (the q58/q101 disciplines): ONE tokenize pass builds the
  * (doc, term, tf) table — vocab × doc scale, never corpus × corpus;
  * document lengths re-aggregate from it; the query side joins on the
  * TERM key (vocab-keyed — the idf table outgrows driver memory at
  * 100 TB, so it is a shuffle join by contract, not a broadcast); the
  * per-(query, doc) fold is one map-side-combined aggregate and the
  * top-k window partitions by query id (the query batch is small by
  * contract).
  *
  * Determinism: tf/df/|d| are exact counts; per-term contributions
  * round to 9, scale to exact LONG nano-units (a round-9 double is
  * the nearest double to k·10⁻⁹, so ×10⁹ re-rounded recovers the
  * integer k exactly), and sum as longs — order-independent like the
  * q101 decimal device but ~3× faster on the hot path (a DECIMAL sum
  * over the query×posting join rows dominated the first cut);
  * ranking orders by (round-9 score desc, doc id). The
  * idf values arrive AS A TABLE — ln is the one transcendental in
  * BM25, and Java's Math.log differs from other engines' libm at the
  * ulp level, so idf is computed once ([[idfTable]]), persisted, and
  * read by BOTH engines (the q97/q119 shared-fixture pattern; the ln
  * formula itself is spec-pinned in Bm25Spec).
  */
object Bm25 {

  /** Per-term BM25 idf over the corpus: (term, df, idf) with
    * idf = round9( ln( (N − df + 0.5)/(df + 0.5) + 1 ) ) — the
    * non-negative "plus one" variant (Lucene's). N = total corpus
    * documents (empty documents count — they dilute df like any
    * non-matching doc).
    */
  def idfTable(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val n = docs.count()
    docs
      .select(explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"),
        round(log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)
          + 1.0), 9).as("idf"))
  }

  /** Top-k BM25 retrieval of `docs` for each query document's distinct
    * term set ("more-like-this"; self-matches excluded). `idf` is the
    * (term, idf) table — typically [[idfTable]] persisted with the
    * corpus. Output: (query_id, doc_id, score, rank).
    */
  def topK(docs: DataFrame, queries: DataFrame, idf: DataFrame, k: Int,
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1 && k1 > 0 && b >= 0 && b <= 1)
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds both the length re-agg and the score join
    val lens = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
    // avgdl over ALL corpus docs (empty docs contribute length 0):
    // exact long totals, one driver-side double division — both engines
    // divide the same integers, so the literal is bit-identical
    val nDocs = docs.count()
    val totLen = lens.agg(sum(col("len"))).head().getLong(0)
    val avgdl = totLen.toDouble / nDocs
    val qterms = queries
      .select(col(idCol).as("query_id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
    val tfPart = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / lit(avgdl)))
    val scored = qterms
      .join(tf, Seq("term"))
      .filter(col("query_id") =!= col("doc_id"))
      .join(lens, Seq("doc_id"))
      .join(idf.select(col("term"), col("idf")), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(round(round(col("idf") * tfPart, 9) * lit(1e9), 0)
        .cast("long")).as("__s"))
      .select(col("query_id"), col("doc_id"),
        round(col("__s").cast("double") / lit(1e9), 9).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
