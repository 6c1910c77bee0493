package graft.tools

object TimeQ156 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "time-q156")
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("q156_exact_substr", "q161_span_cut_stats", "q162_incremental_spans")) {
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        println(f"TIME $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
