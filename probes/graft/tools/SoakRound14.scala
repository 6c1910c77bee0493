package graft.tools

/** Scale soak of the round-14 changes on the SoakGen 10× corpus: the
  * DistributedRank rewrites of the two round-13 weak flags (q73/q105),
  * the argmax q101, model-token chunking (q141), incremental IVF
  * append + drift (q142/q143), truss decomposition (q144), the
  * composed privacy release (q145), BM25 (q146), PII scrub (q147),
  * and TVD drift (q148). One run each: wall time + plan
  * shuffle/broadcast counts, which must match the sf0.01 PlanAudit
  * rows — a scale step changes data volume, never plan shape.
  * Diagnostic main, not part of the driver contract.
  */
object SoakRound14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-round14")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q73_window_ranks", "q101_source_drift",
      "q105_grouped_split", "q141_bpe_chunks", "q142_ivf_append",
      "q143_ivf_drift", "q144_truss_decomposition",
      "q145_training_release", "q146_bm25", "q147_pii_scrub",
      "q148_feature_drift", "q149_global_shuffle", "q150_corpus_datasheet",
      "q151_source_quality", "q152_incremental_df", "q153_drift_timeline",
      "q154_ann_recall_curve", "q155_benchmark_leaks")
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
