package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{VecDot, WinnowHash}

/** SparkSessionExtensions entry point (SURVEY §4.3's extension slot):
  * installs graft's native Catalyst functions into every session built
  * with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`), so
  * `vec_dot` is available to pure-SQL users without any Scala call —
  * the same mechanism Delta/Iceberg use to register their surface.
  * `VecDot.register(spark)` remains for already-built sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"vec_dot takes 2 arguments, got ${exprs.length}")
        VecDot(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_hash"),
      new ExpressionInfo(classOf[WinnowHash].getName, "winnow_hash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, s"winnow_hash takes 3 arguments, got ${exprs.length}")
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"winnow_hash $name must be an INT literal, got $other")
        }
        WinnowHash(exprs(0), intLit(exprs(1), "k"), intLit(exprs(2), "w"))
      }))
  }
}
