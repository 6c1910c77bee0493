package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins BM25 against an independent driver-side reference on a
  * hand-shaped corpus (the textbook formula, computed with plain Scala
  * doubles mirroring the operator's rounding points), the idf fixture
  * formula (the ln device the cross-engine oracle cannot check), and
  * self-exclusion / partitioning determinism.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown cat sleeps"),
    (3L, "a lazy dog and a lazy cat"),
    (4L, "quick quick quick fox"),
    (5L, "completely unrelated words entirely"),
    (6L, ""))

  private def tokens(t: String): Seq[String] =
    t.trim.split("\\s+").filter(_.nonEmpty).toSeq

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("idfTable matches the ln((N-df+0.5)/(df+0.5)+1) formula exactly") {
    val idf = Bm25.idfTable(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val n = corpus.size
    val dfRef = corpus.flatMap(d => tokens(d._2).distinct)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(idf.keySet == dfRef.keySet)
    for ((t, (df, v)) <- idf) {
      assert(df == dfRef(t), s"df($t)")
      assert(v == r9(math.log((n - df + 0.5) / (df + 0.5) + 1.0)), s"idf($t)")
    }
  }

  test("topK equals an independent reference; self excluded; ties by doc id") {
    val docs = corpus.toDF("doc_id", "text")
    val idfDf = Bm25.idfTable(docs)
    val queries = docs.filter(col("doc_id") === 1 || col("doc_id") === 4)
    val got = Bm25.topK(docs, queries, idfDf, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // independent reference
    val n = corpus.size
    val k1 = 1.2; val b = 0.75
    val tfm = corpus.map { case (id, t) =>
      id -> tokens(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val lens = tfm.view.mapValues(_.values.sum).toMap
    val avgdl = lens.values.sum.toDouble / n
    val idfm = corpus.flatMap(d => tokens(d._2).distinct)
      .groupBy(identity).view.mapValues(_.size).map { case (t, df) =>
        t -> r9(math.log((n - df + 0.5) / (df + 0.5) + 1.0)) }.toMap
    def score(q: Long, d: Long): Double = {
      val qts = tokens(corpus.find(_._1 == q).get._2).distinct
      val s = qts.flatMap { t =>
        tfm(d).get(t).map { tf =>
          BigDecimal(r9(idfm(t) * ((tf * (k1 + 1)) /
            (tf + k1 * ((1 - b) + (b * lens(d)) / avgdl)))))
        }
      }.sum
      r9(s.toDouble)
    }
    for (q <- Seq(1L, 4L)) {
      val ranked = corpus.map(_._1).filter(d => d != q && score(q, d) > 0)
        .map(d => (score(q, d), d)).sortBy { case (s, d) => (-s, d) }.take(3)
      ranked.zipWithIndex.foreach { case ((s, d), i) =>
        assert(got((q, i + 1)) == ((d, s)), s"query $q rank ${i + 1}")
      }
      assert(!ranked.exists(_._2 == q), "self-match leaked")
    }
  }

  test("deterministic under input partitioning") {
    val docs = corpus.toDF("doc_id", "text")
    val idfDf = Bm25.idfTable(docs)
    val q = docs.filter(col("doc_id") === 1)
    val a = Bm25.topK(docs.repartition(7), q, idfDf, k = 5)
      .collect().map(_.toSeq).toSet
    val c = Bm25.topK(docs.repartition(2), q, idfDf, k = 5)
      .collect().map(_.toSeq).toSet
    assert(a == c)
  }
}
