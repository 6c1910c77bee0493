package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VecDot

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
  }
}
