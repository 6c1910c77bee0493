package graft.tools

/** Scale soak of the dedup family (q27 MinHash pairs, q36 near-dup
  * groups, q40 end-to-end corpus clean): run each once on an arbitrary
  * documents dir — intended for a 10× (sf1-equivalent) corpus — and
  * print wall time plus the plan's shuffle/broadcast counts. The counts
  * must MATCH the sf0.1 plan audit (PLANS.md): a scale step must change
  * data volume only, never the plan shape. No oracle at this size by
  * design (exact all-pairs Jaccard is intractable); this is the
  * completion + wall-time + plan-shape evidence. Diagnostic main, not
  * part of the driver contract.
  */
object SoakDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-dedup")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q27_minhash_neardup", "q36_neardup_groups",
      "q40_corpus_dedup", "q62_paragraph_dedup", "q68_incremental_dedup")
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // plan shape first (cheap), then one timed materialization
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val broadcasts = lines.count(_.contains("BroadcastExchange"))
      val shuffles = lines.count(_.contains("Exchange")) - broadcasts
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SOAK $name rows=$rows sec=$sec%.2f shuffles=$shuffles broadcasts=$broadcasts")
    }
    spark.stop()
  }
}
