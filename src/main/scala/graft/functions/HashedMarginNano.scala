package graft.functions

import graft.llm.QualityWeights
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-document margin under a BROADCAST learned quality model, as a
  * native Catalyst expression — the production inference path for the
  * fasttext-style filter ([[graft.llm.QualityModel]]): the input is
  * the token array, the model is one broadcast handle (executors pull
  * the weight table once via torrent — the [[BpeTableCount]] device),
  * and the margin folds per row inside the scan projection.
  *
  * Why custom (SURVEY §7.3's "optional Catalyst" slot): a `typedLit`
  * map literal pays an O(width) linear scan per token under
  * `element_at`, and an explode + weight-table join pays a
  * corpus-token-scale shuffle for the doc re-aggregation — this
  * expression is an O(1) array index per token with `doGenCode`
  * keeping the enclosing projection inside WholeStageCodegen. Null in
  * → null out; empty array → 0; null tokens contribute 0.
  */
case class HashedMarginNano(child: Expression,
                            weights: Broadcast[QualityWeights])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_margin_nano requires ARRAY<STRING> input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    weights.value.marginNano(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("qualityWeightsBc", weights,
      classOf[Broadcast[QualityWeights]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((graft.llm.QualityWeights) $bc.value()).marginNano($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedMarginNano =
    copy(child = newChild)

  override def prettyName: String = "hashed_margin_nano"
}

object HashedMarginNano {
  /** Column-level API over a broadcast weight table. */
  def apply(toks: Column, weights: Broadcast[QualityWeights]): Column =
    ColumnShim.column(HashedMarginNano(ColumnShim.expression(toks), weights))
}
