package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning (q91): with the filter on the DIM side
  * only, the day-partitioned fact scan must carry a dynamicpruning
  * subquery in its partition filters — the dim's selected days prune
  * fact files at RUNTIME — and the answer must equal the statically
  * filtered aggregate.
  */
class DppSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q91's fact scan is dynamically pruned by the dim filter; answer matches static") {
    val q91 = graft.SparkEntry.queries("q91_dpp")(spark, dir)
    val plan = q91.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning subquery on the fact scan:\n$plan")

    // answer parity: the three smallest distinct days, statically
    val ev = graft.Tables(spark, dir).events
      .select(to_date(col("ts")).as("d"), col("event_type"), col("value"))
    val days = ev.select(col("d")).distinct().orderBy(col("d")).limit(3)
      .as[java.sql.Date].collect().toSet
    val want = ev.filter(col("d").isin(days.toSeq: _*))
      .groupBy(col("d"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("event_type"),
        col("n_events"), col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    val got = q91.as[(String, String, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
