package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Fused vector dot product as a native Catalyst expression with
  * whole-stage codegen — the hot scalar of every similarity scan
  * (F3's `dot` and all of `graft.llm.Similarity`).
  *
  * Why custom (SURVEY §7.3's "optional Catalyst" slot): the built-in
  * composition `aggregate(zip_with(a, b, _*_), 0d, _+_)` materializes
  * an intermediate array and walks two lambda interpreters per row-pair;
  * this expression compiles to one tight loop over the two unsafe array
  * buffers — no allocation, no virtual calls — and keeps the enclosing
  * projection inside WholeStageCodegen.
  *
  * Numeric contract: identical to the built-in composition — each
  * element pair is widened to Double and accumulated LEFT TO RIGHT, so
  * results are bit-equal with the previous formulation (and with the
  * DuckDB oracle's list_dot_product over DOUBLE[]). Shorter input wins
  * when lengths differ; null in → null out — including a null ELEMENT
  * anywhere in the overlapped prefix (`zip_with`'s `_*_` yields null
  * there and `aggregate`'s `_+_` propagates it; the pre-round-18 eval
  * read the zeroed slot and silently returned a wrong non-null sum).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // a null ELEMENT nulls the result even when both array columns are
  // non-nullable — without this override codegen would inline
  // `ev.isNull` as the constant false and the element guard could
  // not fire
  override def nullable: Boolean = true

  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<FLOAT>/ARRAY<DOUBLE> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() < $n) $n = $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $sum += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  /** Column-level API: `vecDot(a, b)` over ARRAY<FLOAT>/ARRAY<DOUBLE>. */
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(
      VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Make `vec_dot(a, b)` callable from SQL text in this session
    * (`spark.sql("SELECT vec_dot(embedding, q) ...")`). Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => {
        require(exprs.length == 2, s"vec_dot takes 2 arguments, got ${exprs.length}")
        VecDot(exprs(0), exprs(1))
      },
      "built-in")
}
