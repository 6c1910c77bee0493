package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed exact selection: the histogram-locate + in-bin-rank
  * algorithm must equal the sorted-take ⌈q·n⌉ definition on random
  * data, under ties, degenerate (all-equal / singleton) groups, and
  * with multiple quantiles landing in one bin.
  */
class ExactQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def want(values: Seq[Double], q: Double): Double = {
    val sorted = values.sorted
    sorted(math.ceil(q * values.size).toLong.max(1L).toInt - 1)
  }

  test("random data, several groups and quantiles, equals the sorted-take definition") {
    val rng = new scala.util.Random(7)
    val rows = for (g <- 0 until 4; _ <- 0 until 500 + g * 311)
      yield (s"g$g", rng.nextDouble() * 1000 - 500)
    val df = rows.toDF("k", "v").repartition(7)
    val got = ExactQuantile.perGroup(df, Seq("k"), "v",
        Seq("p10" -> 0.1, "p50" -> 0.5, "p99" -> 0.99), bins = 64)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val byG = rows.groupBy(_._1)
    byG.foreach { case (k, vs) =>
      val values = vs.map(_._2)
      assert(got(k) === ((want(values, 0.1), want(values, 0.5), want(values, 0.99))),
        s"group $k")
    }
  }

  test("heavy ties and a degenerate all-equal group stay exact") {
    val rows = (0 until 2000).map(i => ("ties", (i % 7).toDouble)) ++
      (0 until 100).map(_ => ("const", 42.0)) ++
      Seq(("single", 9.5))
    val df = rows.toDF("k", "v").repartition(5)
    val got = ExactQuantile.perGroup(df, Seq("k"), "v",
        Seq("p50" -> 0.5, "p90" -> 0.9), bins = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val byG = rows.groupBy(_._1)
    byG.foreach { case (k, vs) =>
      val values = vs.map(_._2)
      assert(got(k) === ((want(values, 0.5), want(values, 0.9))), s"group $k")
    }
  }

  test("q = 1.0 returns the maximum; two quantiles in one bin both answer") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val got = ExactQuantile.perGroup(df, Seq("k"), "v",
        Seq("p99" -> 0.99, "max" -> 1.0), bins = 1) // one bin: both land in it
      .collect().head
    assert(got.getDouble(1) === 99.0 && got.getDouble(2) === 100.0)
  }

  test("null values are excluded from the order, matching percentile_disc") {
    // nulls interleaved across bins: if any phase counted them the
    // rank arithmetic (and potentially the picked value) would shift
    val rows: Seq[(String, java.lang.Double)] =
      (1 to 100).map(i => ("g", java.lang.Double.valueOf(i.toDouble))) ++
        (0 until 40).map(_ => ("g", null: java.lang.Double)) ++
        Seq(("allnull", null: java.lang.Double))
    val df = rows.toDF("k", "v").repartition(5)
    val got = ExactQuantile.perGroup(df, Seq("k"), "v",
        Seq("p50" -> 0.5, "p90" -> 0.9), bins = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got === Map("g" -> ((50.0, 90.0)))) // all-null group has no quantile rows
  }

  test("null group keys fail loudly instead of corrupting the histogram join") {
    val rows: Seq[(String, Double)] = Seq(("g", 1.0), (null, 2.0))
    val df = rows.toDF("k", "v")
    val e = intercept[IllegalArgumentException](
      ExactQuantile.perGroup(df, Seq("k"), "v", Seq("p50" -> 0.5)))
    assert(e.getMessage.contains("null group key"))
  }

  test("invalid arguments rejected") {
    val df = Seq(("g", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException](
      ExactQuantile.perGroup(df, Seq("k"), "v", Seq("p0" -> 0.0)))
    intercept[IllegalArgumentException](
      ExactQuantile.perGroup(df, Seq("k"), "v", Seq()))
  }
}
