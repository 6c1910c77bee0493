package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VecDot: value parity with the built-in composition (bit-exact),
  * null/length semantics, and both codegen + interpreted paths.
  */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def builtinDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-exact parity with aggregate(zip_with(...)) on random float vectors") {
    val rng = new scala.util.Random(5)
    val df = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
    val got = df.select(col("id"), VecDot(col("a"), col("b")).as("d"),
      builtinDot(col("a"), col("b")).as("want"))
    assert(got.filter(col("d") =!= col("want")).count() === 0L)
  }

  test("null in, null out; shorter length wins") {
    val df = Seq(
      (1L, Array(1f, 2f, 3f), Array(2f, 3f)),   // 1*2 + 2*3 = 8
      (2L, null.asInstanceOf[Array[Float]], Array(1f, 2f))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), VecDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L) === Some(8.0))
    assert(rows(2L) === None)
  }

  test("null ELEMENT in the overlapped prefix nulls the result (builtin parity)") {
    // zip_with's _*_ yields null for a null element and aggregate's _+_
    // propagates it — the native expression must agree, in BOTH the
    // codegen path (DataFrame) and the interpreted path (eval)
    val df = Seq(
      (1L, Array[java.lang.Double](1.0, null, 3.0), Array[java.lang.Double](2.0, 2.0, 2.0)),
      (2L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](2.0, 2.0)),
      // null element BEYOND the overlapped prefix: shorter wins, sum is 2
      (3L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VecDot(col("a"), col("b")).as("d"),
      builtinDot(col("a"), col("b")).as("want")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) === None)
    assert(got(2L) === Some(6.0))
    assert(got(3L) === Some(2.0))
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val interp = VecDot(
      Literal.create(Seq[java.lang.Double](1.0, null), ArrayType(DoubleType)),
      Literal.create(Seq[java.lang.Double](2.0, 2.0), ArrayType(DoubleType)))
    assert(interp.eval(null) === null)
  }

  test("double arrays and mixed float/double are accepted") {
    val df = Seq((Array(0.5, 2.0), Array(4.0, 0.25))).toDF("a", "b")
    assert(df.select(VecDot(col("a"), col("b"))).head().getDouble(0) === 2.5)
    val mixed = Seq((Array(1f, 2f), Array(3.0, 4.0))).toDF("a", "b")
    assert(mixed.select(VecDot(col("a"), col("b"))).head().getDouble(0) === 11.0)
  }

  test("interpreted eval matches codegen") {
    val a = VecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1f, 2f, 3f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2f, 2f, 2f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(a.eval(null) === 12.0)
  }

  test("registered as a SQL function: vec_dot callable from sql text") {
    VecDot.register(spark)
    Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b").createOrReplaceTempView("vdots")
    val got = spark.sql("SELECT vec_dot(a, b) AS d FROM vdots").head().getDouble(0)
    assert(got === 11.0)
  }

  test("GraftExtensions injects vec_dot into a session's function registry") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val registry = org.apache.spark.sql.graftshim.ColumnShim
      .applyFunctionExtensions(ext,
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    assert(registry.functionExists(FunctionIdentifier("vec_dot")))
    val expr = registry.lookupFunction(FunctionIdentifier("vec_dot"),
      Seq(Literal.create(Array(1f, 2f)), Literal.create(Array(3f, 4f))))
    assert(expr.eval(null) === 11.0)
  }

  test("stays inside whole-stage codegen (no fallback in the plan)") {
    // LocalTableScan of a literal Seq never codegens — use a range scan
    val df = spark.range(100).select(
      array(col("id").cast("float"), (col("id") + 1).cast("float")).as("a"),
      array(lit(1f), lit(2f)).as("b"))
    val proj = df.select(VecDot(col("a"), col("b")).as("d"))
    // `*(n)` is the WholeStageCodegen marker in the simple plan string
    assert(proj.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(proj.agg(sum("d")).head().getDouble(0) > 0)
  }
}
