package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE soak measurement loop (round-18 review: SoakR17Tail and
  * SoakR18Tail carried verbatim copies of it, so a measurement-
  * discipline fix could land in one and silently not the other): per
  * target, executed-plan shuffle/broadcast counts, then ONE timed noop
  * save with the row count riding the same pass as an [[Observation]]
  * metric — no second action, no checkpoint re-materialization (the
  * round-17 verdict's double-execution wart, fixed at the source).
  */
object SoakRunner {
  def run(spark: SparkSession, dir: String, targets: Seq[String]): Unit =
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val broadcasts = lines.count(_.contains("BroadcastExchange"))
      val shuffles = lines.count(_.contains("Exchange")) - broadcasts
      val obs = Observation(s"rows_$name")
      val t0 = System.nanoTime()
      fn(spark, dir).observe(obs, count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = obs.get("n").asInstanceOf[Long]
      println(f"SOAK $name rows=$rows sec=$sec%.2f shuffles=$shuffles broadcasts=$broadcasts")
    }
}
