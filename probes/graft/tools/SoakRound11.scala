package graft.tools

/** Scale soak of the round-11 additions on the SoakGen 10× corpus
  * (q100 exact percentiles, q102 OHLC, q103 streaks over 10× events;
  * q101 source drift over 10× documents; q104 PageRank over the 10×
  * lineitem-derived graph — 10 disjoint copies, so ranks per copy
  * must be scale-invariant). One run each: wall time + plan
  * shuffle/broadcast counts, which must match the sf0.01 PlanAudit
  * rows — a scale step changes data volume, never plan shape.
  * Diagnostic main, not part of the driver contract.
  */
object SoakRound11 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-round11")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q100_exact_percentile", "q101_source_drift",
      "q102_ohlc_downsample", "q103_activity_streaks", "q104_pagerank",
      "q105_grouped_split", "q106_orc_scan", "q107_interval_join", "q108_ppr",
      "q109_audience_overlap", "q110_mad_outliers", "q111_ab_test",
      "q112_trend_slope", "q113_edit_distance_join",
      "q114_bigram_lm", "q115_markov_transitions", "q116_skipgram_pairs", "q117_equal_freq_bins", "q118_k_anonymity")
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
