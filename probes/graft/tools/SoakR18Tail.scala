package graft.tools

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Scale soak of the round-17/18 tail on the SoakGen 10× corpus
  * (SoakR17Tail stops at q192): the decon cut-vs-drop policy (q193 —
  * one gram pass), merge-budget fertility (q194), keep-longest
  * resolution (q195 — the CC-bearing one), incremental maintenance of
  * both learned artifacts (q196/q197), Gumbel DSIR resampling (q198 —
  * fixture build + DistributedRank), and the policy funnel (q199 —
  * LSH + CC + double billing). One run each: wall time + plan
  * shuffle/broadcast counts, which must match the sf0.01 PlanAudit
  * rows — a scale step changes data volume, never plan shape.
  *
  * Round-17 verdict "What's wrong" 4 fixed here: the row count rides
  * the SAME noop pass as the timing via an [[Observation]] metric —
  * no second action, no checkpoint re-materialization (SoakR17Tail
  * ran every target twice).
  * Diagnostic main, not part of the driver contract.
  */
object SoakR18Tail {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-r18-tail")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q193_decon_policy", "q194_merge_budget",
      "q195_neardup_keep_longest", "q196_quality_merged",
      "q197_bpe_refresh", "q198_dsir_resample", "q199_funnel_policy",
      "q200_resampled_mix")
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val broadcasts = lines.count(_.contains("BroadcastExchange"))
      val shuffles = lines.count(_.contains("Exchange")) - broadcasts
      val obs = Observation(s"rows_$name")
      val t0 = System.nanoTime()
      fn(spark, dir).observe(obs, count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = obs.get("n").asInstanceOf[Long]
      println(f"SOAK $name rows=$rows sec=$sec%.2f shuffles=$shuffles broadcasts=$broadcasts")
    }
    spark.stop()
  }
}
