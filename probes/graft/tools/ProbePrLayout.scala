package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off probe: does the persisted repartition(src) edge layout
  * actually avoid the edge-side exchange at RUNTIME (AQE final plan),
  * given spark.sql.optimizer.canChangeCachedPlanOutputPartitioning?
  */
object ProbePrLayout {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 4, app = "probe-pr-layout")
    spark.sparkContext.setLogLevel("WARN")
    println("flag=" + spark.conf.getOption(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"))
    val e = spark.range(100000)
      .selectExpr("concat('s', id % 500) AS src", "concat('p', id % 970) AS dst")
      .repartition(col("src")).persist()
    e.count() // materialize the cache first, like run()'s nodes.count()
    val r = spark.range(500)
      .selectExpr("concat('s', id) AS src", "id * 1000 AS rank_scaled")
    val it = e.hint("merge").join(r, Seq("src"))
      .groupBy("dst").agg(sum("rank_scaled").as("m"))
    it.write.format("noop").mode("overwrite").save()
    println("=== FINAL PLAN ===")
    println(it.queryExecution.executedPlan.toString)
  }
}
