package graft.tools

import org.apache.spark.sql.functions._

/** Timing probe for semanticPairs variants at bench conditions
  * (local[32], sf dir from args). Diagnostic main, not driver contract.
  */
object ProbeSem {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "probe-sem")
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries("q60_semantic_dedup")
    // warm-up
    q(spark, dir).write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"RUN$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
