package graft.tools

/** Scale soak of the round-16 tail + round-17 additions on the
  * SoakGen 10× corpus (round-16 verdict item 7 — SoakR16Selection
  * stops at q184): the release composition (q185), retrieval eval
  * (q186), incremental-LM merge (q187), multi-benchmark decon
  * attribution (q188), BPE merge training + learned-vocab billing
  * (q189/q190), and the learned quality gate + calibration
  * (q191/q192). One run each via [[SoakRunner]] (round 18 factored the
  * shared loop out and fixed the round-17 double-execution wart — row
  * counts ride the timed noop pass as an Observation metric): wall
  * time + plan shuffle/broadcast counts, which must match the sf0.01
  * PlanAudit rows — a scale step changes data volume, never plan
  * shape. (The q185/q188 deconTrain plants and the q191/q192 junk
  * mixture derive from doc_id arithmetic, so they scale with the
  * corpus by construction.)
  * Diagnostic main, not part of the driver contract.
  */
object SoakR17Tail {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-r17-tail")
    spark.sparkContext.setLogLevel("WARN")
    SoakRunner.run(spark, dir, Seq("q185_release_pipeline",
      "q186_retrieval_eval", "q187_lm_merged", "q188_multi_bench_decon",
      "q189_bpe_train", "q190_bpe_learned_tokens",
      "q191_quality_learned", "q192_learned_calibration"))
    spark.stop()
  }
}
