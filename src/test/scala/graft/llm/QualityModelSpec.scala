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

  /** JVM twin of the md5 bucket device at [[QualityModel.NumBuckets]]. */
  private def bucketOf(tok: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex.take(8), 16) %
      QualityModel.NumBuckets).toInt
  }

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fitWeights matches hand-computed add-one NB log-ratios") {
    val target = Seq("aa bb", "bb cc aa").toDF("text")
    val raw = Seq("aa dd", "dd dd ee").toDF("text")
    val got = QualityModel.fitWeights(target, raw)
      .as[(Long, Double)].collect().toMap

    val tCounts = Seq("aa", "bb", "bb", "cc", "aa")
      .groupBy(bucketOf).map { case (b, xs) => b -> xs.size }
    val rCounts = Seq("aa", "dd", "dd", "dd", "ee")
      .groupBy(bucketOf).map { case (b, xs) => b -> xs.size }
    val d = QualityModel.NumBuckets.toDouble
    val ref = (tCounts.keySet ++ rCounts.keySet).map { b =>
      b.toLong -> r9(
        math.log((tCounts.getOrElse(b, 0) + 1.0) / (5.0 + d)) -
        math.log((rCounts.getOrElse(b, 0) + 1.0) / (5.0 + d)))
    }.toMap
    assert(got.keySet === ref.keySet)
    ref.foreach { case (b, lr) => assert(got(b) === lr, s"bucket $b") }
  }

  test("learned scoring matches an independent fold over the weights") {
    val target = Seq("aa bb", "bb cc aa").toDF("text")
    val raw = Seq("aa dd", "dd dd ee").toDF("text")
    val w = QualityModel.loadWeights(QualityModel.fitWeights(target, raw))
    val docs = Seq(
      (1L, "aa bb cc"),
      (2L, "dd dd ee"),
      (3L, "zz unseen tokens"), // absent buckets contribute 0
      (4L, "  aa   dd  "),
      (5L, "")).toDF("doc_id", "text")
    val got = QualityModel.scoreDocsLearned(docs,
        spark.sparkContext.broadcast(w))
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val texts = Map(1L -> "aa bb cc", 2L -> "dd dd ee",
      3L -> "zz unseen tokens", 4L -> "  aa   dd  ", 5L -> "")
    texts.foreach { case (id, text) =>
      val toks = text.trim match {
        case "" => Array.empty[String]
        case s  => s.split("\\s+")
      }
      val margin = toks.map(t => w.nano(bucketOf(t))).sum
      val (n, m, score, keep) = got(id)
      assert(n === toks.length.toLong, s"doc $id n_tokens")
      assert(m === margin, s"doc $id margin")
      val refScore = if (toks.isEmpty) 0.0
        else r9(margin.toDouble / (toks.length.toDouble * 1e9))
      assert(score === refScore, s"doc $id score")
      assert(keep === (margin >= 0L), s"doc $id gate")
    }
  }

  test("count state re-derives the weights; batch merge ≡ full refit") {
    val t1 = Seq("aa bb", "bb cc aa").toDF("text")
    val r1 = Seq("aa dd", "dd dd ee").toDF("text")
    val t2 = Seq("ff aa", "").toDF("text")
    val r2 = Seq("gg gg dd").toDF("text")
    // sufficient statistic: llrFromCounts ∘ fitCounts ≡ fitWeights
    val viaCounts = QualityModel.llrFromCounts(QualityModel.fitCounts(t1, r1))
      .as[(Long, Double)].collect().toMap
    val direct = QualityModel.fitWeights(t1, r1)
      .as[(Long, Double)].collect().toMap
    assert(viaCounts === direct)
    // incremental maintenance: mergeCounts ≡ fitCounts over the union
    val merged = QualityModel.mergeCounts(
        QualityModel.fitCounts(t1, r1), t2, r2)
      .as[(Long, Long, Long)].collect().toSet
    val refit = QualityModel.fitCounts(t1.unionByName(t2), r1.unionByName(r2))
      .as[(Long, Long, Long)].collect().toSet
    assert(merged === refit)
  }

  test("learned weights are antisymmetric under the zz-junk twin") {
    // equal class sizes + add-one smoothing ⇒ llr(clean fit) =
    // −llr(junk fit with classes swapped); q191/q192's mixture
    // classes rely on this to land near ±⅓ of the clean score
    val clean = Seq("aa bb", "bb cc aa").toDF("text")
    val junk = Seq("zzaa zzbb", "zzbb zzcc zzaa").toDF("text")
    val ab = QualityModel.fitWeights(clean, junk)
      .as[(Long, Double)].collect().toMap
    val ba = QualityModel.fitWeights(junk, clean)
      .as[(Long, Double)].collect().toMap
    assert(ab.keySet === ba.keySet)
    ab.foreach { case (b, lr) => assert(ba(b) === -lr, s"bucket $b") }
  }

  test("learned inference is a zero-shuffle scan projection") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val w = QualityModel.loadWeights(QualityModel.fitWeights(
      t.documents.limit(4), t.documents.limit(8)))
    val plan = QualityModel.scoreDocsLearned(t.documents,
        spark.sparkContext.broadcast(w))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"learned quality inference must not shuffle:\n$plan")
    // `*(n)` is the WholeStageCodegen marker in the simple plan string
    assert(plan.contains("*(1) Project"),
      s"learned quality inference should stay codegen'd:\n$plan")
  }
}
