package graft.tools

/** Scale soak of the round-12 additions on the SoakGen 10× corpus:
  * the pHash image/audio near-dups (10× fixture decode + blocked
  * join), BPE token counting across the budget/packing family,
  * the composed TrainingSet pipeline, k-anonymity release, triangle
  * counting, bigram fluency, PPS sampling, rank/rolling window
  * features, the funnel, and the integrity audit. One run each: wall
  * time + plan shuffle/broadcast counts, which must match the sf0.01
  * PlanAudit rows — a scale step changes data volume, never plan
  * shape. Diagnostic main, not part of the driver contract.
  */
object SoakRound12 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-round12")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q119_phash_image_neardup", "q120_bpe_budget_mix",
      "q121_training_set", "q122_k_anon_release", "q123_triangle_count",
      "q124_bigram_doc_score", "q125_bpe_seq_packing",
      "q126_phash_audio_neardup", "q127_pps_sample", "q128_rank_features",
      "q129_funnel", "q130_ref_integrity", "q131_rolling_features")
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
