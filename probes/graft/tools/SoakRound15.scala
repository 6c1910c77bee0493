package graft.tools

/** Scale soak of the round-15 changes on the SoakGen 10× corpus: the
  * pre-trimmed retrieval family (q146 BM25 on the persisted index,
  * q21/q76 cosine top-k, q47/q77 PQ scans, q154 recall curve), exact
  * repeated-substring dedup (q156), incremental PQ maintenance
  * (q157/q158), hybrid RRF fusion (q159) and the incremental
  * datasheet (q160). One run each: wall time + plan shuffle/broadcast
  * counts, which must match the sf0.01 PlanAudit rows — a scale step
  * changes data volume, never plan shape. Diagnostic main, not part
  * of the driver contract.
  */
object SoakRound15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-round15")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q21_cosine_topk", "q146_bm25", "q76_ann_ivf_pinned",
      "q47_pq_adc", "q77_ivfpq_pinned", "q154_ann_recall_curve",
      "q156_exact_substr", "q157_pq_append", "q158_pq_drift",
      "q159_hybrid_rrf", "q160_incremental_datasheet",
      "q161_span_cut_stats", "q162_incremental_spans")
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val broadcasts = lines.count(_.contains("BroadcastExchange"))
      val shuffles = lines.count(_.contains("Exchange")) - broadcasts
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = fn(spark, dir).count()
      println(f"SOAK $name rows=$rows sec=$sec%.2f shuffles=$shuffles broadcasts=$broadcasts")
    }
    spark.stop()
  }
}
