package graft.tools

/** Scale soak of the round-16 changes on the SoakGen 10× corpus:
  * span-level benchmark decontamination (q165) and its applied form
  * (q168), the ingest-time span-cleaned batch (q166), SemDeDup at
  * cluster granularity (q167), the shared-pass recall curve (q154),
  * and the reworked span family (streamed gramTable + linear
  * applyCuts: q156/q161/q162/q163). One run each: wall time + plan
  * shuffle/broadcast counts, which must match the sf0.01 PlanAudit
  * rows — a scale step changes data volume, never plan shape.
  * Diagnostic main, not part of the driver contract.
  */
object SoakRound16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-round16")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q154_ann_recall_curve", "q156_exact_substr",
      "q161_span_cut_stats", "q162_incremental_spans", "q163_span_cleaned",
      "q164_gram_index_growth", "q165_bench_decon_cuts",
      "q166_ingest_span_clean", "q167_semdedup_clustered",
      "q168_decon_cleaned")
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
