package graft.tools

/** Steady-state timing of q146 (BM25) — diagnostic. */
object ProbeBm25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "probe-bm25")
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("q146_bm25")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIME run$i ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
