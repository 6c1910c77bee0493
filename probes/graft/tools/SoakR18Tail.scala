package graft.tools

/** Scale soak of the round-18 tail on the SoakGen 10× corpus
  * (SoakR17Tail stops at q192): the decon cut-vs-drop policy (q193 —
  * one gram pass), merge-budget fertility (q194), keep-longest
  * resolution (q195 — the CC-bearing one), incremental maintenance of
  * both learned artifacts (q196/q197), Gumbel DSIR resampling (q198 —
  * fixture build + DistributedRank), the policy funnel (q199 — LSH +
  * CC + double billing), and the Gumbel-fed release mix (q200). One
  * run each via [[SoakRunner]]: wall time + plan shuffle/broadcast
  * counts, which must match the sf0.01 PlanAudit rows — a scale step
  * changes data volume, never plan shape.
  * Diagnostic main, not part of the driver contract.
  */
object SoakR18Tail {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-r18-tail")
    spark.sparkContext.setLogLevel("WARN")
    SoakRunner.run(spark, dir, Seq("q193_decon_policy", "q194_merge_budget",
      "q195_neardup_keep_longest", "q196_quality_merged",
      "q197_bpe_refresh", "q198_dsir_resample", "q199_funnel_policy",
      "q200_resampled_mix"))
    spark.stop()
  }
}
