package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}

/** True iff ANY element of a string array is in a BROADCAST string
  * set — the membership-probe sibling of [[HashedMarginNano]] (same
  * torrent-broadcast device): executors pull the set once, each row
  * pays one O(1) hash probe per element inside the scan projection.
  *
  * Why custom: `isInCollection` compiles the set INTO the expression
  * tree (an InSet literal), so every task closure re-ships it — fine
  * for dozens of entries, megabytes per task at a 100k-gram benchmark
  * suite. This expression ships one broadcast handle instead, which
  * is what keeps [[graft.streaming.DocStream.releaseGate]]'s span
  * probe metadata-cheap at production bench-set sizes. Null in → null
  * out; null elements never match; empty array → false. Membership
  * keys are the UTF-8 string forms (the caller builds the set from
  * the same md5-hex gram strings the batch side joins on).
  */
case class AnyInBroadcastSet(child: Expression,
                             set: Broadcast[scala.collection.immutable.Set[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"any_in_broadcast_set requires ARRAY<STRING> input, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    AnyInBroadcastSet.probe(input.asInstanceOf[ArrayData], set.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("anyInSetBc", set,
      classOf[Broadcast[scala.collection.immutable.Set[String]]].getName)
    // the companion CASE CLASS suppresses static forwarders, so the
    // generated Java calls the object through MODULE$
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.AnyInBroadcastSet$$.MODULE$$.probe($c,
         |  (scala.collection.immutable.Set) $bc.value());""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AnyInBroadcastSet =
    copy(child = newChild)

  override def prettyName: String = "any_in_broadcast_set"
}

object AnyInBroadcastSet {
  /** Shared by eval and codegen: one hash probe per non-null element. */
  def probe(arr: ArrayData, set: scala.collection.immutable.Set[String]): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i).toString))
        return true
      i += 1
    }
    false
  }

  /** Column-level API over a broadcast set. */
  def apply(arr: Column, set: Broadcast[scala.collection.immutable.Set[String]]): Column =
    ColumnShim.column(AnyInBroadcastSet(ColumnShim.expression(arr), set))
}
