package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The round-10 skew/reshape query patterns (q84/q86/q87), pinned on
  * synthetic data: salted exact distinct ≡ naive distinct, windowed
  * dedup keeps the (ts, id)-minimal row per bucket, unpivot plans as
  * Expand with a single exchange.
  */
class SkewPatternsSpec extends SparkSpec {
  import spark.implicits._

  test("disjoint-salt two-stage count-distinct equals naive distinct") {
    // 3 hot keys × many users; users deliberately collide across keys
    val df = (0 until 5000).map { i =>
      (s"k${i % 3}", (i * 7919L) % 997L)
    }.toDF("key", "user_id")
    val naive = df.groupBy("key")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    val salted = df
      .select(col("key"), col("user_id"), pmod(col("user_id"), lit(16)).as("__s"))
      .groupBy(col("key"), col("__s"))
      .agg(countDistinct(col("user_id")).as("__d"), count(lit(1)).as("__n"))
      .groupBy(col("key"))
      .agg(sum(col("__d")).cast("long").as("n_users"), sum(col("__n")).cast("long").as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted === naive)
  }

  test("salted distinct is exact even when one salt class is empty") {
    // all users ≡ 0 mod 16 → 15 empty salt classes, sums still exact
    val df = Seq(("a", 16L), ("a", 32L), ("a", 16L), ("b", 48L)).toDF("key", "user_id")
    val salted = df
      .select(col("key"), col("user_id"), pmod(col("user_id"), lit(16)).as("__s"))
      .groupBy(col("key"), col("__s"))
      .agg(countDistinct(col("user_id")).as("__d"))
      .groupBy(col("key")).agg(sum(col("__d")).cast("long").as("n_users"))
      .as[(String, Long)].collect().toMap
    assert(salted === Map("a" -> 2L, "b" -> 1L))
  }

  test("windowed dedup keeps exactly the (ts, id)-minimal row per bucket") {
    val df = Seq(
      // user 1, type x: two events in the same 600 s bucket + one later
      (10L, 100L, 1L, "x"), (11L, 500L, 1L, "x"), (12L, 700L, 1L, "x"),
      // tie on ts inside a bucket → event_id breaks it
      (21L, 1200L, 2L, "x"), (20L, 1200L, 2L, "x"),
      // same user, different type: independent buckets
      (30L, 100L, 1L, "y")
    ).toDF("event_id", "epoch", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("__b"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val kept = df
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        floor(unix_timestamp(col("ts")) / 600).as("__b"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("event_id")).as[Long].collect().toSet
    assert(kept === Set(10L, 12L, 20L, 30L))
  }

  test("unpivot keeps the single-exchange aggregate plan (Expand, no extra shuffle)") {
    val df = (0 until 100)
      .map(i => (s"g${i % 3}", i.toDouble, i * 2.0)).toDF("g", "m1", "m2")
    val melted = df
      .unpivot(Array(col("g")), Array(col("m1"), col("m2")), "metric", "val")
      .groupBy(col("g"), col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("s"))
    val plan = melted.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"no Expand node in:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges in:\n$plan")
    // and the long form itself is the UNION ALL semantics
    val viaUnion = df.select(col("g"), lit("m1").as("metric"), col("m1").as("val"))
      .unionByName(df.select(col("g"), lit("m2").as("metric"), col("m2").as("val")))
      .groupBy(col("g"), col("metric"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("s"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(melted.as[(String, String, Long, Double)].collect().toSet === viaUnion)
  }
}
