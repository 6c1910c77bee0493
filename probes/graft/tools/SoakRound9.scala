package graft.tools

/** Scale soak of the round-9 additions (q78 md5-SimHash pairs, q79
  * JSON extraction, q80 gap-fill, q81 retention) on a SoakGen 10×
  * corpus: one run each, wall time + plan shuffle/broadcast counts.
  * The counts must MATCH the sf0.1 plan audit rows (PLANS.md) — a
  * scale step must change data volume only, never the plan shape.
  * Diagnostic main, not part of the driver contract.
  */
object SoakRound9 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-round9")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q78_simhash_md5", "q79_json_extract",
      "q80_gapfill", "q81_retention")
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
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
