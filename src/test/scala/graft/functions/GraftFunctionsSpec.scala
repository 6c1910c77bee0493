package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("f1Score: 2PR/(P+R) with undefined guard (F1)") {
    assert(GraftFunctions.f1Score(0.5, 0.5) === Some(0.5))
    val f = GraftFunctions.f1Score(0.8, 0.4).get
    assert(math.abs(f - 2 * 0.8 * 0.4 / 1.2) < 1e-12)
    assert(GraftFunctions.f1Score(0.0, 0.0) === None)
  }

  test("sigmoidDot column: sigmoid of the inner product (F3)") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(3.0f, -1.0f)), // dot = 1
      (Seq(0.0f, 0.0f), Seq(5.0f, 5.0f))   // dot = 0
    ).toDF("a", "b")
    val out = df.select(GraftFunctions.sigmoidDot(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(out(0) - 1.0 / (1 + math.exp(-1.0))) < 1e-9)
    assert(math.abs(out(1) - 0.5) < 1e-12)
  }

  test("l2Normalize column: unit norm, zero vector passes through (F4)") {
    val df = Seq(Seq(3.0f, 4.0f), Seq(0.0f, 0.0f)).toDF("v")
    val out = df.select(GraftFunctions.l2Normalize(col("v"))).as[Seq[Double]].collect()
    assert(out(0).map(x => math.abs(x)).sum > 0)
    assert(math.abs(out(0).map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(out(0)(0) - 0.6) < 1e-6 && math.abs(out(0)(1) - 0.8) < 1e-6)
    assert(out(1) === Seq(0.0, 0.0))
  }

  test("local twins agree with column versions") {
    val a = Array(1.0f, 2.0f); val b = Array(3.0f, -1.0f)
    assert(GraftFunctions.dotLocal(a, b) === 1.0)
    val n = GraftFunctions.l2NormalizeLocal(Array(3.0f, 4.0f))
    assert(math.abs(n(0) - 0.6f) < 1e-6 && math.abs(n(1) - 0.8f) < 1e-6)
    assert(GraftFunctions.sigmoid(0.0) === 0.5)
  }

  test("f1ScoreCol: null when P+R=0") {
    val df = Seq((0.5, 0.5), (0.0, 0.0)).toDF("p", "r")
    val out = df.select(GraftFunctions.f1ScoreCol(col("p"), col("r"))).collect()
    assert(out(0).getDouble(0) === 0.5)
    assert(out(1).isNullAt(0))
  }
}
