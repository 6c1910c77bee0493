package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** The broadcast set re-keyed by UTF8String, built lazily per
    * deserialized expression instance (the [[WordHits]] idiom): the
    * old probe decoded every array element to java.lang.String per
    * ROW just to test membership; this probes the scan's UTF8String
    * zero-copy. The one-time rebuild cost is |set| inserts per task —
    * noise against per-row decode at production bench-set sizes.
    */
  @transient private lazy val utf8Set: java.util.HashSet[UTF8String] = {
    val v = set.value
    val s = new java.util.HashSet[UTF8String](v.size * 2)
    v.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Shared by eval and codegen: one hash probe per non-null element. */
  def compute(arr: ArrayData): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && utf8Set.contains(arr.getUTF8String(i)))
        return true
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("anyInSet", this, classOf[AnyInBroadcastSet].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AnyInBroadcastSet =
    copy(child = newChild)

  override def prettyName: String = "any_in_broadcast_set"
}

object AnyInBroadcastSet {
  /** Column-level API over a broadcast set. */
  def apply(arr: Column, set: Broadcast[scala.collection.immutable.Set[String]]): Column =
    ColumnShim.column(AnyInBroadcastSet(ColumnShim.expression(arr), set))
}
