package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins BM25 against an independent driver-side reference on a
  * hand-shaped corpus (the textbook formula, computed with plain Scala
  * doubles mirroring the operator's rounding points), the idf fixture
  * formula (the ln device the cross-engine oracle cannot check),
  * self-exclusion / partitioning determinism, and the round-15
  * retrieval-shape contract: the per-query rank window reads the
  * bounded-heap pre-trim, and `topK` fires ZERO driver actions (all
  * corpus-scale work happens at index build).
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

  test("buildIndex: exact postings/lens and corpus constants incl. empty docs") {
    val idx = Bm25.buildIndex(corpus.toDF("doc_id", "text"))
    assert(idx.nDocs == 6, "empty docs count toward N")
    assert(idx.totLen == corpus.map(d => tokens(d._2).size).sum)
    val lens = idx.lens.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lens == corpus.filter(_._2.nonEmpty)
      .map(d => d._1 -> tokens(d._2).size.toLong).toMap)
    assert(idx.avgdl == idx.totLen.toDouble / 6)
  }

  test("topK equals an independent reference; self excluded; ties by doc id") {
    val docs = corpus.toDF("doc_id", "text")
    val idx = Bm25.buildIndex(docs)
    val idfDf = Bm25.idfTable(docs)
    val queries = docs.filter(col("doc_id") === 1 || col("doc_id") === 4)
    val got = Bm25.topK(idx, queries, idfDf, k = 3)
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
    val a = Bm25.topK(Bm25.buildIndex(docs.repartition(7)), q, idfDf, k = 5)
      .collect().map(_.toSeq).toSet
    val c = Bm25.topK(Bm25.buildIndex(docs.repartition(2)), q, idfDf, k = 5)
      .collect().map(_.toSeq).toSet
    assert(a == c)
  }

  test("the rank window reads the bounded-heap pre-trim (round-15 shape fix)") {
    val docs = corpus.toDF("doc_id", "text")
    val df = Bm25.topK(Bm25.buildIndex(docs),
      docs.filter(col("doc_id") === 1), Bm25.idfTable(docs), k = 3)
    val lines = df.queryExecution.executedPlan.toString.split("\n")
    val window = lines.indexWhere(_.contains("Window"))
    val trim = lines.indexWhere(_.contains("MapPartitions"))
    assert(window >= 0 && trim >= 0, s"missing node:\n${lines.mkString("\n")}")
    // plans print root-first: upstream (scan-side) nodes appear later,
    // so the trim must sit BELOW the window (the q88 discipline) — the
    // window shuffles ≤ k × partitions rows per query, never the full
    // posting union
    assert(window < trim,
      s"pre-trim is not upstream of the rank window:\n${lines.mkString("\n")}")
  }

  test("topK fires ZERO driver actions (index carries the corpus constants)") {
    val docs = corpus.toDF("doc_id", "text")
    val idx = Bm25.buildIndex(docs)       // corpus-scale actions live HERE
    val idfDf = Bm25.idfTable(docs)
    // count only jobs tagged with the probe group, which wraps ONLY
    // the topK call — the index build's still-queued events and the
    // sentinel's own (multi-)job count stay out of the tally
    val probeJobs = new java.util.concurrent.atomic.AtomicInteger
    val sentinelJobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = if (js.properties == null) null
          else js.properties.getProperty("spark.jobGroup.id")
        if (g == "bm25probe") probeJobs.incrementAndGet()
        if (g == "bm25sentinel") sentinelJobs.incrementAndGet()
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup("bm25probe", "bm25 zero-action probe")
      Bm25.topK(idx, docs.filter(col("doc_id") === 1), idfDf, k = 3)
      // sentinel action: listener events deliver in order, so once the
      // sentinel's start is visible, any job topK had fired would be too
      spark.sparkContext.setJobGroup("bm25sentinel", "bm25 probe sentinel")
      spark.range(1).count()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (sentinelJobs.get() < 1 && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(sentinelJobs.get() >= 1, "sentinel job never observed")
      assert(probeJobs.get() == 0,
        s"topK fired ${probeJobs.get()} driver action(s); the old shape ran " +
          "docs.count() + an avgdl head() per retrieval call")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("mergeIndex / mergeIdf equal the full rebuild over corpus plus batch") {
    // the q170 contract: fresh-id batch absorbed via the incremental
    // operators only must reproduce buildIndex/idfTable over the union
    val batch = Seq(
      (100L, "the quick brown fox again with extra words"), // df bumps
      (101L, "nvonly nvwords nvhere nvnothing shared"),     // new vocab
      (102L, ""))                                           // empty doc
    val cdf = corpus.toDF("doc_id", "text")
    val bdf = batch.toDF("doc_id", "text")
    val udf_ = (corpus ++ batch).toDF("doc_id", "text")
    val base = Bm25.buildIndex(cdf)
    val merged = Bm25.mergeIndex(base, bdf)
    val rebuilt = Bm25.buildIndex(udf_)
    assert(merged.nDocs == rebuilt.nDocs && merged.totLen == rebuilt.totLen)
    assert(merged.postings.as[(Long, String, Long)].collect().toSet ==
      rebuilt.postings.as[(Long, String, Long)].collect().toSet)
    assert(merged.lens.as[(Long, Long)].collect().toSet ==
      rebuilt.lens.as[(Long, Long)].collect().toSet)
    val mIdf = Bm25.mergeIdf(Bm25.idfTable(cdf), base.nDocs, bdf)
      .as[(String, Long, Double)].collect().toSet
    val rIdf = Bm25.idfTable(udf_).as[(String, Long, Double)].collect().toSet
    assert(mIdf == rIdf, "merged idf must equal the full rebuild")
    assert(mIdf.exists(_._1.startsWith("nv")), "new vocab must enter the idf")
    // and retrieval against the merged parts == against the rebuilt parts
    val q = udf_.filter(col("doc_id").isin(1L, 100L, 101L))
    val got = Bm25.topK(merged, q, Bm25.mergeIdf(Bm25.idfTable(cdf),
        base.nDocs, bdf), k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = Bm25.topK(rebuilt, q, Bm25.idfTable(udf_), k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want && got.nonEmpty)
  }
}
