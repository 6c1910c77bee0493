package graft.tools

import org.apache.spark.sql.SparkSession

/** Judge probe: analyze every SparkEntry query at sf0.001 and report
  * which ones fail analysis (the BENCH_r08 crash).
  */
object ProbeAnalyze {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.TempWarehouse.dir("graft-probe-analyze"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Analysis failures (the defect class this probe exists for) are
    // counted separately from other runtime errors: q54/q57/q64 run
    // real write jobs inside fn() via the ensure* fixtures, so an OOM
    // or disk error there must not masquerade as a catalog defect —
    // and fatal JVM errors propagate instead of being swallowed.
    var analysisBad = 0
    var otherBad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, dir).queryExecution.analyzed
        println(s"OK $name")
      } catch {
        case e: org.apache.spark.sql.AnalysisException =>
          analysisBad += 1
          println(s"FAIL-ANALYSIS $name : ${String.valueOf(e.getMessage).take(400)}")
        case scala.util.control.NonFatal(e) =>
          otherBad += 1
          println(s"FAIL-OTHER $name : ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(400)}")
      }
    }
    println(s"analysis-failures: $analysisBad")
    println(s"other-failures: $otherBad")
    println(s"total-failures: ${analysisBad + otherBad}")
    spark.stop()
  }
}
