package graft.tools

/** Ad-hoc single-query timer: runMain graft.tools.TimeQ <sfDir> <name> [reps] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local(32, "timeq")
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"TIMEQ $name rep$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
