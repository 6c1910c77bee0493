package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Equi-depth bucket index against a driver-computed boundary array —
  * the per-dimension rank step of Z-order layout (`operators.ZOrder`).
  *
  * `boundaries` is a sorted ascending array of interior cut points
  * (typically `approxQuantile` output, so buckets hold ~equal row
  * counts regardless of the value distribution — the property that
  * makes the interleaved curve balanced under skew, where equi-WIDTH
  * bucketing collapses most rows into one bucket). The bucket of `v`
  * is the count of boundaries ≤ v, i.e. values below the first cut
  * map to 0 and values at or above the last map to
  * `boundaries.length`. NaN maps to 0 (it compares false against
  * every cut) and null propagates — both degrade layout locality for
  * those rows only, never correctness.
  *
  * Why custom: the composable alternatives either run interpreted
  * per row (a HOF fold over a boundary array literal) or blow up the
  * expression tree (a 2^bits-way CASE chain); this is one binary
  * search inside whole-stage codegen.
  */
case class RankBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "empty boundary array")
  require(boundaries.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "boundaries must be strictly ascending")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rank_bucket takes a DOUBLE value (cast first), got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any = bucket(v.asInstanceOf[Double])

  /** upper bound: number of boundaries <= v */
  def bucket(v: Double): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rankBucket", this, classOf[RankBucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bucket($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RankBucket =
    copy(child = newChild)

  // content equality for the Array field (see BloomMightContain): the
  // synthesized reference-compare would defeat semanticEquals reuse
  override def equals(other: Any): Boolean = other match {
    case r: RankBucket =>
      child == r.child && java.util.Arrays.equals(boundaries, r.boundaries)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(boundaries)

  override def prettyName: String = "rank_bucket"
}

object RankBucket {
  /** Column API; `value` must already be DOUBLE. */
  def apply(value: Column, boundaries: Array[Double]): Column =
    ColumnShim.column(
      RankBucket(ColumnShim.expression(value), boundaries))
}
