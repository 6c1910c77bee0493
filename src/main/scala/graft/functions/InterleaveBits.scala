package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of per-dimension bucket indices — the
  * curve step of `operators.ZOrder`, after `RankBucket` ranks each
  * dimension.
  *
  * Bit `i` of dimension `j` lands at output bit `i * numDims + j`, so
  * sorting by the result orders rows along the Z-curve: rows close in
  * EVERY dimension land in the same files, which is what lets min/max
  * file stats skip on any prefix of the layout columns (the multi-dim
  * generalization of sort-by-one-column clustering).
  *
  * Contract: `bits` per dimension is a constant; `bits × numDims` must
  * fit a positive long (≤ 63). Bucket values clamp into
  * `[0, 2^bits)` — clamping (vs masking) keeps the mapping monotone
  * when a caller passes an index that overflows its bit budget. A null
  * element ranks as 0 (nulls cluster at the curve origin); a null
  * array propagates null.
  */
case class InterleaveBits(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits per dimension must be in [1,63], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"interleave_bits takes ARRAY<INT> bucket indices, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = interleave(a.asInstanceOf[ArrayData])

  def interleave(arr: ArrayData): Long = {
    val d = arr.numElements()
    if (d == 0) return 0L
    if (bits.toLong * d > 63)
      throw new IllegalArgumentException(
        s"interleave_bits: $d dims x $bits bits = ${bits * d} bits > 63")
    val mask = (1L << bits) - 1L
    var z = 0L
    var j = 0
    while (j < d) {
      val raw = if (arr.isNullAt(j)) 0L else arr.getInt(j).toLong
      val b = if (raw < 0L) 0L else if (raw > mask) mask else raw
      var i = 0
      while (i < bits) {
        z |= ((b >> i) & 1L) << (i * d + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("interleaveBits", this,
      classOf[InterleaveBits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.interleave($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): InterleaveBits =
    copy(child = newChild)

  override def prettyName: String = "interleave_bits"
}

object InterleaveBits {
  /** Column API over an `array(int, ...)` of bucket indices. */
  def apply(buckets: Column, bits: Int): Column =
    ColumnShim.column(
      InterleaveBits(ColumnShim.expression(buckets), bits))
}
