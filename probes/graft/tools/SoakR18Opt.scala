package graft.tools

/** Scale soak of every query whose operator internals the round-18
  * OPTIMIZATION pass reshaped (OPTIMIZATION_r18.md): the tokenize-once
  * checkpoints (q27/q36/q40/q62/q68 + the LSH consumers q135/q195/
  * q199), the TrainingSet skinny-metadata projection (q121/q145), the
  * KAnonymity input checkpoint (q132), the q99 array-fold argmax, the
  * EditDistanceJoin explode rewrite (q113), and the cutList checkpoint
  * (q161/q163). One run each on the SoakGen 10× corpus via
  * [[SoakRunner]] — wall + plan shuffle/broadcast counts; an
  * optimization must not change plan shape between SFs.
  * Diagnostic main, not part of the driver contract.
  */
object SoakR18Opt {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-r18-opt")
    spark.sparkContext.setLogLevel("WARN")
    SoakRunner.run(spark, dir, Seq(
      "q27_minhash_neardup", "q36_neardup_groups", "q40_corpus_dedup",
      "q62_paragraph_dedup", "q68_incremental_dedup", "q99_label_audit",
      "q113_edit_distance_join", "q121_training_set", "q132_k_anon_ladder",
      "q135_group_best", "q145_training_release", "q161_span_cut_stats",
      "q163_span_cleaned", "q195_neardup_keep_longest", "q199_funnel_policy"))
    spark.stop()
  }
}
