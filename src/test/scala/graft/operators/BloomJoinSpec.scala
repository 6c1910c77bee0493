package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.functions.BloomMightContain

/** BloomJoin.inner: exact equivalence to the plain join, real map-side
  * selectivity, codegen'd probe, and no false negatives ever.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  // big side: 20k rows over 2k keys; small side: 50 keys, half of them
  // absent from big (exercises both unmatched directions)
  private lazy val big = spark.range(0, 20000)
    .select((col("id") % 2000).as("k"), col("id").as("payload"))
    .cache()
  private lazy val small = (0 until 50)
    .map(i => (i * 80L, s"dim$i")) // 0,80,...: 25 keys < 2000 exist in big
    .toDF("k", "name").cache()

  test("result is exactly the plain inner join") {
    val got = BloomJoin.inner(big, small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    val want = big.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("no false negatives at any capacity: undersized filter still exact") {
    val got = BloomJoin.inner(big, small, Seq("k"), expectedItems = 2, fpp = 0.5)
      .count()
    assert(got === big.join(small, Seq("k")).count())
  }

  test("the pre-filter drops most non-matching big rows map-side") {
    val bf = small.select(xxhash64(col("k")).as("__kh"))
      .stat.bloomFilter("__kh", 50, 0.01)
    val passed = big.filter(BloomMightContain(xxhash64(col("k")), bf)).count()
    val trueMatches = big.join(small.select("k").distinct, Seq("k"), "left_semi").count()
    // 25 of 2000 keys match => ~250 true rows; 1% fpp adds ~ 200 rows max
    assert(passed >= trueMatches, "bloom must never drop a true match")
    assert(passed < big.count() / 4,
      s"pre-filter passed $passed of ${big.count()} rows — not selective")
  }

  test("probe stays inside whole-stage codegen") {
    val bf = small.select(xxhash64(col("k")).as("__kh"))
      .stat.bloomFilter("__kh", 50, 0.01)
    val filtered = big.filter(BloomMightContain(xxhash64(col("k")), bf))
    val plan = filtered.queryExecution.executedPlan.toString
    val probeLine = plan.linesIterator
      .find(_.contains("bloom_might_contain")).getOrElse("")
    assert(probeLine.contains("*("),
      s"bloom probe must be in a WholeStageCodegen span:\n$plan")
  }

  test("empty build side yields an empty result, not an NPE") {
    val none = small.filter(col("name") === "no-such-dim")
    assert(BloomJoin.inner(big, none, Seq("k")).count() === 0L)
    // same with a capacity hint (the path that can't rely on count())
    assert(BloomJoin.inner(big, none, Seq("k"), expectedItems = 7).count() === 0L)
  }

  test("null keys neither crash nor match") {
    val bigN = Seq((Option(1L), "a"), (None, "b")).toDF("k", "v")
    val out = BloomJoin.inner(bigN, Seq((1L, "x")).toDF("k", "w"), Seq("k"))
    assert(out.select("v").as[String].collect().toSeq === Seq("a"))
  }

  test("SQL registration round-trip via GraftExtensions") {
    val bf = small.select(xxhash64(col("k")).as("__kh"))
      .stat.bloomFilter("__kh", 50, 0.01)
    val reg = {
      val ext = new org.apache.spark.sql.SparkSessionExtensions
      new graft.GraftExtensions().apply(ext)
      org.apache.spark.sql.graftshim.ColumnShim.applyFunctionExtensions(
        ext, org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    }
    val bytes = BloomMightContain.serialize(bf)
    val expr = reg.lookupFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_might_contain"),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
          bytes, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.catalyst.expressions.Literal(0L)))
    assert(expr.dataType === org.apache.spark.sql.types.BooleanType)
    assert(expr.eval(null).isInstanceOf[Boolean])
  }
}
