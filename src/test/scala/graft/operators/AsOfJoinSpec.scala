package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** AsOfJoin.backward: hand-traced semantics, equivalence to a
  * brute-force range-join reference on random data, and the plan
  * contract (one keyed shuffle, no single-partition stage).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("hand trace: inclusive backward match per key, null when none") {
    val left = Seq(
      (1L, "a", ts(10)), // after b@5  -> matches 5
      (2L, "a", ts(5)),  // ties b@5   -> inclusive, matches 5
      (3L, "a", ts(4)),  // before all -> null
      (4L, "b", ts(100)),// b has no right rows -> null
      (5L, "a", ts(20))  // after 5 and 15 -> matches 15
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts(5), 0.5),
      ("a", ts(15), 1.5)
    ).toDF("k", "rt", "v")

    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got === Map(1L -> Some(0.5), 2L -> Some(0.5), 3L -> None,
      4L -> None, 5L -> Some(1.5)))
  }

  test("random data equals the brute-force range-join reference") {
    val rng = new scala.util.Random(7)
    val left = (1 to 400).map(i =>
      (i.toLong, s"k${rng.nextInt(8)}", ts(rng.nextInt(1000).toLong)))
      .toDF("id", "k", "t")
    val right = (1 to 150).map(i =>
      (s"k${rng.nextInt(10)}", ts(rng.nextInt(1000).toLong), rng.nextDouble()))
      .toDF("k", "rt", "v")
      // contract: unique (key, ts) on the right
      .groupBy("k", "rt").agg(max("v").as("v"))

    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("id", "rt", "v")

    // reference: plain range join + keep the max rt per left row
    val want = left.join(right, left("k") === right("k") && col("t") >= col("rt"), "left")
      .groupBy(col("id").as("wid"))
      .agg(max(struct(col("rt"), col("v"))).as("m"))
      .select(col("wid"), col("m.rt").as("wrt"), col("m.v").as("wv"))

    val diff = got.join(want, col("id") === col("wid"))
      .filter(!(col("rt") <=> col("wrt")) || !(col("v") <=> col("wv")))
    assert(got.count() === 400L)
    assert(diff.count() === 0L, diff.collect().mkString("\n"))
  }

  test("plan: single keyed shuffle, no single-partition stage") {
    val left = (1 to 50).map(i => (i.toLong, s"k${i % 4}", ts(i.toLong)))
      .toDF("id", "k", "t")
    val right = (1 to 20).map(i => (s"k${i % 4}", ts(i * 2L), i.toDouble))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"as-of join must stay distributed:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, // one per union branch pre-AQE-reuse
      s"expected at most one keyed exchange per side:\n$plan")
  }

  test("colliding right output column is rejected") {
    val l = Seq((1L, "a", ts(1))).toDF("id", "k", "ts")
    val r = Seq(("a", ts(1), 2.0)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("v"))
    }
  }

  test("reserved internal column names are rejected on either input") {
    // a left column literally named __ts would be silently overwritten
    // (it would emerge as a copy of leftTs) without the guard
    val lBad = Seq((1L, "a", ts(10), 9L)).toDF("id", "k", "t", "__ts")
    val r = Seq(("a", ts(5), 0.5)).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(lBad, r, Seq("k"), "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("reserved"))
    val l = Seq((1L, "a", ts(10))).toDF("id", "k", "t")
    val rBad = Seq(("a", ts(5), 0.5, 0)).toDF("k", "rt", "v", "__side")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, rBad, Seq("k"), "t", "rt", Seq("v"))
    }
  }
}
