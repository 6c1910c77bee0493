package graft.tools

/** Diagnostic: which queries' parquet scans carry an expensive
  * expression inlined by filter pushdown/inference (the q156 pathology
  * found in round 15 — a size > 0 filter duplicates the whole
  * generator-child expression into the scan)? Plan inspection only.
  * Diagnostic main, not part of the contract.
  */
object ProbeGenFilter {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(8, "probe-genfilter")
    spark.sparkContext.setLogLevel("ERROR")
    val expensive = Seq("minhash", "shingle", "winnow", "md5",
      "lambdafunction", "hyperplane", "simhash")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val scans = plan.split("\n").filter(_.contains("DataFilters"))
      val bad = scans.filter(l => expensive.exists(e => l.toLowerCase.contains(e)))
      if (bad.nonEmpty) {
        flagged += 1
        println(s"GEN $name inlinedScans=${bad.length} of ${scans.length}")
        bad.take(2).foreach(l => println("   " + l.trim.take(150)))
      }
    }
    println(s"GEN total-flagged: $flagged")
    spark.stop()
  }
}
