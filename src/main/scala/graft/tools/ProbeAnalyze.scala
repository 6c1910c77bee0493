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
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, dir).queryExecution.analyzed
        println(s"OK $name")
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"FAIL $name : ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(400)}")
      }
    }
    println(s"total-failures: $bad")
    spark.stop()
  }
}
