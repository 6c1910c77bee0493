package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE's runtime skew-join split — the OTHER half of the engine's skew
  * story (q37 salts a known-hot key at plan time; AQE re-plans an
  * UNKNOWN hot key at runtime from actual map-output sizes): a join
  * with one dominant key must come out of adaptive execution with its
  * skewed partition split (`skew=true` on the join node), and the
  * answer must equal the same join without the thresholds forced.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val skewConfs = Map(
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](confs: Map[String, String])(f: => A): A = {
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("one hot key triggers a runtime skew split; answer unchanged") {
    // 150k of 200k fact rows land on key 0 — at 4 shuffle partitions
    // one reducer would own 75% of the join input without the split
    val fact = spark.range(200000)
      .select(when(col("id") < 150000, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 10).as("w"))

    val expected = fact.join(dim, "k")
      .agg(count(lit(1)), sum(col("v") + col("w")).cast("long"))
      .as[(Long, Long)].head()

    withConfs(skewConfs) {
      val joined = fact.join(dim, "k")
      val got = joined
        .agg(count(lit(1)), sum(col("v") + col("w")).cast("long"))
        .as[(Long, Long)].head()
      assert(got === expected)
      // AQE finalizes per-execution, and count()/write() wrap the plan
      // in a NEW QueryExecution — collect() runs THIS dataframe's own
      // QE, whose adaptive plan is then final
      assert(joined.collect().length === 150000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    }
  }
}
