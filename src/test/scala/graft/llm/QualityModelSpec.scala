package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** QualityModel (q172): the hashed linear scorer's margin matches an
  * independent JVM recompute of the md5-bucket/weight arithmetic,
  * edge docs behave per contract, and inference stays a zero-shuffle
  * scan projection (the operator's whole scale claim).
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reimplementation: JVM md5 instead of Spark's. */
  private def refMargin(text: String): Long = {
    val toks = text.trim match {
      case "" => Array.empty[String]
      case t  => t.split("\\s+")
    }
    toks.map { tok =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val bucket = java.lang.Long.parseLong(hex.take(8), 16) %
        QualityModel.NumBuckets
      ((bucket * 2654435761L) % 1000003L) % 2001L - 1000L
    }.sum
  }

  test("margin matches the independent md5/weight recompute") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "repeated repeated repeated tokens tokens"),
      (4L, "  leading and trailing   whitespace  "),
      (5L, "")).toDF("doc_id", "text")
    val got = QualityModel.scoreDocs(docs)
      .select(col("doc_id"), col("margin_milli"), col("n_tokens"),
        col("score"), col("keep"))
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "repeated repeated repeated tokens tokens",
      4L -> "  leading and trailing   whitespace  ",
      5L -> "")
    texts.foreach { case (id, text) =>
      val (margin, n, score, keep) = got(id)
      val ref = refMargin(text)
      assert(margin === ref, s"doc $id margin")
      val refN = if (text.trim.isEmpty) 0 else text.trim.split("\\s+").length
      assert(n === refN.toLong, s"doc $id token count")
      val refScore = if (refN == 0) 0.0
        else BigDecimal(ref.toDouble / (refN.toDouble * 1000.0))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score === refScore, s"doc $id score")
      assert(keep === (ref >= 0), s"doc $id gate")
    }
  }

  test("empty doc: zero margin, zero score, passes the gate") {
    val out = QualityModel.scoreDocs(Seq((9L, "   ")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Double, Boolean)].collect().head
    assert(out === ((9L, 0L, 0L, 0.0, true)))
  }

  test("weights stay in the documented [-1000, 1000] milli range") {
    val w = spark.range(0, QualityModel.NumBuckets)
      .select(QualityModel.weightMilli(col("id")).as("w"))
      .agg(min(col("w")), max(col("w"))).as[(Long, Long)].collect().head
    assert(w._1 >= -1000L && w._2 <= 1000L)
  }

  test("inference is a zero-shuffle scan projection") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val plan = QualityModel.scoreDocs(t.documents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"quality-model inference must not shuffle:\n$plan")
  }
}
