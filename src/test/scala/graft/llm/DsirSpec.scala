package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dsir (q173/q174): the fitted llr table matches an independent JVM
  * recompute of the smoothed hashed-unigram log-ratio on a tiny
  * corpus, document scores match a brute-force fold over that table,
  * and the deterministic top-fraction selection equals the sorted
  * prefix.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val targetDocs = Seq(
    (1L, "good clean prose with the usual words"),
    (2L, "the usual words again and again"))
  private val extraDocs = Seq(
    (3L, "spammy spam tokens zzz qqq"),
    (4L, "the usual words plus spam zzz"),
    (5L, ""))
  private lazy val target = targetDocs.toDF("doc_id", "text")
  private lazy val raw = (targetDocs ++ extraDocs).toDF("doc_id", "text")

  private def bucketOf(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16) % Dsir.NumBuckets
  }

  private def toks(text: String): Seq[String] =
    if (text.trim.isEmpty) Seq.empty else text.trim.split("\\s+").toSeq

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent model fit over the tiny corpus. */
  private lazy val refLlr: Map[Long, Double] = {
    val d = Dsir.NumBuckets.toDouble
    val tc = targetDocs.flatMap(t => toks(t._2)).groupBy(bucketOf)
      .map { case (b, xs) => b -> xs.size.toLong }
    val rc = (targetDocs ++ extraDocs).flatMap(t => toks(t._2))
      .groupBy(bucketOf).map { case (b, xs) => b -> xs.size.toLong }
    val nt = targetDocs.map(t => toks(t._2).size).sum.toDouble
    val nr = (targetDocs ++ extraDocs).map(t => toks(t._2).size).sum.toDouble
    (tc.keySet ++ rc.keySet).map { b =>
      b -> r9(math.log((tc.getOrElse(b, 0L) + 1L) / (nt + d)) -
        math.log((rc.getOrElse(b, 0L) + 1L) / (nr + d)))
    }.toMap
  }

  test("llrTable matches the independent smoothed log-ratio fit") {
    val got = Dsir.llrTable(target, raw)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === refLlr.keySet)
    refLlr.foreach { case (b, lr) =>
      assert(got(b) === lr, s"bucket $b")
    }
  }

  test("scoreDocs matches a brute-force fold over the fitted table") {
    val scored = Dsir.scoreDocs(raw, Dsir.llrTable(target, raw))
      .select(col("doc_id"), col("n_tokens"), col("score"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (targetDocs ++ extraDocs).foreach { case (id, text) =>
      val ts = toks(text)
      val nanoSum = ts.map(t => math.round(refLlr(bucketOf(t)) * 1e9)).sum
      val expected = r9(nanoSum.toDouble / 1e9)
      assert(scored(id)._1 === ts.size.toLong, s"doc $id n_tokens")
      assert(scored(id)._2 === expected, s"doc $id score")
    }
  }

  test("inline (literal-map) scoring is bit-identical to the join form") {
    val llr = Dsir.llrTable(target, raw)
    val viaJoin = Dsir.scoreDocs(raw, llr)
      .select(col("doc_id"), col("n_tokens"), col("score"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val viaMap = Dsir.scoreDocsInline(raw, Dsir.loadModel(llr))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaMap === viaJoin)
  }

  test("inline scoring is a zero-shuffle scan projection") {
    val llr = Dsir.loadModel(Dsir.llrTable(target, raw))
    val plan = Dsir.scoreDocsInline(raw, llr)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"inline DSIR scoring must not shuffle:\n$plan")
  }

  test("selectTopFraction equals the sorted (score desc, id) prefix") {
    val scored = Dsir.scoreDocs(raw, Dsir.llrTable(target, raw))
    val got = Dsir.selectTopFraction(scored, denom = 3)
      .select(col("doc_id"), col("rank"))
      .as[(Long, Long)].collect().sortBy(_._2).toSeq
    val all = scored.select(col("doc_id"),
        round(col("score") * 1e9, 0).cast("long"))
      .as[(Long, Long)].collect()
      .sortBy { case (id, s) => (-s, id) }.toSeq
    val expected = all.take(all.size / 3).zipWithIndex
      .map { case ((id, _), i) => (id, (i + 1).toLong) }
    assert(got === expected)
    assert(got.size === raw.count() / 3)
  }
}
