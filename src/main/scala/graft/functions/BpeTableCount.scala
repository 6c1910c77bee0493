package graft.functions

import graft.llm.BpeVocab
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Model-token count under a BROADCAST BPE vocabulary, as a native
  * Catalyst expression — the production path for billing text in
  * model tokens (round-12 verdict item 2: the inline `replace`-chain
  * twin in [[graft.llm.Bpe]] ships its merge table inside the
  * expression tree, which cannot hold a real ~50k-merge vocab; this
  * expression ships one broadcast handle instead, and executors pull
  * the table once via torrent).
  *
  * Why custom (SURVEY §7.3's "optional Catalyst" slot, VecDot's
  * pattern): the count is a per-row scalar inside the scan projection
  * — no shuffle, no state — and `doGenCode` keeps the enclosing
  * projection inside WholeStageCodegen: the generated code is one
  * virtual-free call into the broadcast vocab's greedy encoder (with
  * its per-executor word memo). Null in → null out; empty text → 0.
  */
case class BpeTableCount(child: Expression, vocab: Broadcast[BpeVocab])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_table_count requires STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    vocab.value.countText(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bpeVocabBc", vocab,
      classOf[Broadcast[BpeVocab]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((graft.llm.BpeVocab) $bc.value()).countText($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTableCount =
    copy(child = newChild)

  override def prettyName: String = "bpe_table_count"
}

object BpeTableCount {
  /** Column-level API over a broadcast vocab. */
  def apply(text: Column, vocab: Broadcast[BpeVocab]): Column =
    ColumnShim.column(BpeTableCount(ColumnShim.expression(text), vocab))
}
