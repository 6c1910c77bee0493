package graft.tools

/** Scale soak of the round-16 selection/report family on the SoakGen
  * 10× corpus: model-based quality gate + calibration (q172/q182),
  * DSIR weights/selection (q173/q174), bigram-LM scoring (q175),
  * token shards (q176), LSH band tuning (q177), SemDeDup sweep
  * (q178), dedup funnel (q179), BPE fertility (q180), temperature
  * mix (q181), model-score drift (q183), band-index growth (q184).
  * One run each: wall time + plan shuffle/broadcast counts, which
  * must match the sf0.01 PlanAudit rows — a scale step changes data
  * volume, never plan shape. (The pre-round-18 +900000 fresh-id
  * batch offsets of q175/q184 used to alias the copy-9 id band
  * 900000-904999 at soak scale; round 18 moved the whole offset
  * family to ≥ 10⁶ per the round-17 ADVICE, so the soak is now
  * collision-free too — FreshIdContractSpec pins both bands.)
  * Diagnostic main, not part of the driver contract.
  */
object SoakR16Selection {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-r16-selection")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q172_quality_model", "q173_dsir_weights",
      "q174_dsir_select", "q175_lm_score", "q176_token_shards",
      "q177_lsh_tuning", "q178_semdedup_sweep", "q179_dedup_funnel",
      "q180_bpe_fertility", "q181_temperature_mix",
      "q182_quality_calibration", "q183_model_score_drift",
      "q184_band_index_growth")
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
