package graft.tools

/** Plan audit: print the parquet ReadSchema and exchange count for every
  * SparkEntry query — the "would this survive 100×" checklist (column
  * pruning reached the scan? how many shuffles?). Diagnostic main, not
  * part of the driver contract.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(4, "plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val reads = lines.filter(_.contains("ReadSchema"))
        .map(_.replaceAll(".*ReadSchema: ", "").take(90)).distinct
      // a BroadcastExchange moves a small side to every executor — NOT
      // a shuffle; count the two separately so the audit grades the
      // right thing (shuffles repartition the big side)
      val broadcasts = lines.count(_.contains("BroadcastExchange"))
      val shuffles = lines.count(_.contains("Exchange")) - broadcasts
      println(s"AUDIT $name shuffles=$shuffles broadcasts=$broadcasts " +
        s"reads=${reads.mkString(" ; ")}")
    }
    spark.stop()
  }
}
