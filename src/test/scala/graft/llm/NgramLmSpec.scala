package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NgramLm (q175): the fitted log-prob tables match an independent
  * JVM recompute of the add-one-smoothed bigram LM, and scoring
  * exercises all three backoff paths with exact nano-unit sums.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // a b appears twice, a c once; vocabulary {a, b, c} -> V = 3
  private lazy val corpus = Seq(
    (1L, "a b a b"),
    (2L, "a c")).toDF("doc_id", "text")

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  // hand counts: bigrams of doc1 = (a b), (b a), (a b); doc2 = (a c)
  //   c2: (a,b)=2, (b,a)=1, (a,c)=1 ; c1: a=3, b=1 ; V=3
  private val refBigram = Map(
    ("a", "b") -> r9(math.log(3.0 / 6.0)),
    ("b", "a") -> r9(math.log(2.0 / 4.0)),
    ("a", "c") -> r9(math.log(2.0 / 6.0)))
  private val refW1 = Map(
    "a" -> r9(math.log(1.0 / 6.0)),
    "b" -> r9(math.log(1.0 / 4.0)))
  private val refLp0 = r9(math.log(1.0 / 3.0))

  test("fit matches the hand-computed add-one bigram LM") {
    val (b2, b1, st) = NgramLm.fit(corpus)
    assert(b2.select(col("w1"), col("w2"), col("lp"))
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap === refBigram)
    assert(b1.select(col("w1"), col("lp_u"))
      .as[(String, Double)].collect().toMap === refW1)
    assert(st.select(col("v"), col("lp0"))
      .as[(Long, Double)].collect().toSeq === Seq((3L, refLp0)))
  }

  test("mergeCounts ≡ refit over corpus ∪ batch, lp tables bit-equal") {
    val batch = Seq(
      (10L, "a b c a"),   // adds seen transitions + (c,a)
      (11L, "d d a")      // new vocabulary d
    ).toDF("doc_id", "text")
    val full = corpus.unionByName(batch)
    val (oc2, ov) = NgramLm.fitCounts(corpus)
    val (mc2, mv) = NgramLm.mergeCounts(oc2, ov, batch)
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val (fc2, fv) = NgramLm.fitCounts(full)
    assert(counts(mc2) === counts(fc2), "merged bigram counts")
    assert(mv.as[String].collect().toSet === fv.as[String].collect().toSet,
      "merged vocabulary")
    // and the lp tables derived from merged counts equal a full refit
    val (m2, m1, m0) = NgramLm.lpTables(mc2, mv)
    val (f2, f1, f0) = NgramLm.fit(full)
    def lp2(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    def lp1(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Double)].collect().toMap
    assert(lp2(m2) === lp2(f2))
    assert(lp1(m1) === lp1(f1))
    assert(m0.as[(Long, Double)].collect().toSeq ===
      f0.as[(Long, Double)].collect().toSeq)
  }

  test("scoreDocs takes the right backoff path per bigram") {
    val (b2, b1, st) = NgramLm.fit(corpus)
    val batch = Seq(
      (10L, "a b"),    // seen bigram
      (11L, "b c"),    // w1=b seen, (b,c) unseen -> w1 backoff
      (12L, "z z z"),  // w1=z unseen -> lp0 (twice)
      (13L, "c a"),    // w1=c has no outgoing training bigram -> lp0
      (14L, "solo"),   // single token: no bigram -> 0 over 0
      (15L, "")        // empty
    ).toDF("doc_id", "text")
    val got = NgramLm.scoreDocs(batch, b2, b1, st)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    def avg(lps: Seq[Double]): Double = {
      val s = lps.map(lp => math.round(lp * 1e9)).sum
      r9(s.toDouble / 1e9 / lps.size)
    }
    assert(got(10L) === ((1L, avg(Seq(refBigram(("a", "b")))))))
    assert(got(11L) === ((1L, avg(Seq(refW1("b"))))))
    assert(got(12L) === ((2L, avg(Seq(refLp0, refLp0)))))
    assert(got(13L) === ((1L, avg(Seq(refLp0)))))
    assert(got(14L) === ((0L, 0.0)))
    assert(got(15L) === ((0L, 0.0)))
  }
}
