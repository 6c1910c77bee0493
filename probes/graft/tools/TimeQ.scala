package graft.tools

/** Ad-hoc single-query timer: runMain graft.tools.TimeQ <sfDir> <name...> [reps=N]
  *
  * Round-18: timed action is the noop sink (guide §1.4 — count() lets
  * Catalyst prune scalar pipelines away; Bench itself times noop), one
  * uncounted warm-up rep per query at the same sf, row counts ride the
  * timed pass via an Observation so nothing runs twice.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.find(_.startsWith("reps=")).map(_.drop(5).toInt).getOrElse(3)
    val names = args.drop(1).filterNot(_.startsWith("reps="))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "timeq")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm-up
      val walls = (1 to reps).map { i =>
        val obs = new org.apache.spark.sql.Observation(s"timeq_${name}_$i")
        val t0 = System.nanoTime()
        fn(spark, dir)
          .observe(obs, org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)))
          .write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"TIMEQ $name rep$i rows=${obs.get("count(1)")} $w%.2f s")
        w
      }
      println(f"TIMEQ $name median=${walls.sorted.apply(walls.size / 2)}%.2f s")
    }
    spark.stop()
  }
}
