package graft.operators

import graft.SparkSpec

/** q49 (approx_percentile sketch, the 100 TB percentile plan) vs q31
  * (exact sort-based percentile): the sketch at accuracy 10000
  * guarantees rank error ≤ n/10000, so at sf0.1 its group percentiles
  * must sit within a tight value band of the exact answer. Pins the
  * approx-vs-exact tradeoff q31's comment names, on real data.
  */
class PercentileScaleSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile(accuracy=10000) tracks the exact percentiles at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val exact = graft.SparkEntry.queries("q31_percentiles")(spark, dir)
      .select("l_returnflag", "p50_qty", "p90_price", "n")
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val approx = graft.SparkEntry.queries("q49_percentiles_approx")(spark, dir)
      .select("l_returnflag", "p50_qty", "p90_price", "n")
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(approx.keySet === exact.keySet)
    assert(exact.size === 3, "lineitem has 3 return flags")
    exact.foreach { case (flag, (_, p50e, p90e, nE)) =>
      val (_, p50a, p90a, nA) = approx(flag)
      assert(nA === nE, s"group counts must agree for $flag")
      // rank error <= n/10000 ranks; on these dense distributions that
      // is well under 1% in value
      assert(math.abs(p50a - p50e) / math.max(p50e, 1e-9) <= 0.01,
        s"$flag p50: approx $p50a vs exact $p50e")
      assert(math.abs(p90a - p90e) / math.max(p90e, 1e-9) <= 0.01,
        s"$flag p90: approx $p90a vs exact $p90e")
    }
  }
}
