package graft.tools

/** Scale soak of the round-10 additions (q85 prefix-filter Jaccard
  * join, q86 salted distinct, q87 window dedup, q88 hash sample, q89
  * partition prune; q84 reads lineitem, which the SoakGen corpus does
  * not amplify — its Expand+agg plan is trivially linear) on a SoakGen
  * 10× corpus: one run each,
  * wall time + plan shuffle/broadcast counts. The counts must MATCH
  * the sf0.1 plan audit rows (PLANS.md) — a scale step must change
  * data volume only, never the plan shape (q85's df-attach join is the
  * allowed exception: broadcast at sf0.01, shuffle when the vocabulary
  * outgrows the threshold — both shapes keyed). Diagnostic main, not
  * part of the driver contract.
  */
object SoakRound10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-round10")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q85_prefix_jaccard", "q86_salted_distinct",
      "q87_window_dedup", "q88_hash_sample", "q89_partition_prune",
      "q91_dpp", "q92_dim_standardize", "q93_gram_matrix")
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val broadcasts = lines.count(_.contains("BroadcastExchange"))
      val shuffles = lines.count(_.contains("Exchange")) - broadcasts
      // noop write (Bench's materialization): count() would let
      // Catalyst prune aggregate VALUE expressions — q93's decimal
      // sums measured 2.5 s under count() vs 7 s fully materialized
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = fn(spark, dir).count()
      println(f"SOAK $name rows=$rows sec=$sec%.2f shuffles=$shuffles broadcasts=$broadcasts")
    }
    spark.stop()
  }
}
