package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch MERGE aggregate — the missing half of Spark's
  * frequent-items story: the builtin `count_min_sketch(col, eps,
  * conf, seed)` aggregate produces a serialized sketch, but nothing in
  * the SQL surface can MERGE stored sketch blobs — which is exactly
  * what the per-day pre-aggregate pattern needs (q59's HLL shape, q64's
  * histogram shape, now item counts): persist a ~KB sketch per
  * (group, day), merge any time range at query time without rescanning
  * events.
  *
  * CMS cells are SUMS, so merging per-day sketches built with the same
  * (eps, confidence, seed) is bit-identical to sketching the
  * concatenated stream — deterministic, order-independent (the property
  * CmsSketchSpec pins). Incompatible sketches (different parameters)
  * fail loudly via `mergeInPlace`.
  */
case class CmsMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends SketchMergeAgg[CountMinSketch] {

  override protected def producerName: String = "count_min_sketch"

  override protected def readSketch(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override protected def writeSketch(sketch: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    sketch.writeTo(out)
    out.toByteArray
  }

  override protected def mergeInto(acc: CountMinSketch,
                                   other: CountMinSketch): CountMinSketch = {
    acc.mergeInPlace(other); acc
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)

  override def prettyName: String = "cms_merge"
}

object CmsMergeAgg {
  /** Column API over a `count_min_sketch(...)` binary column. */
  def apply(sketch: Column): Column =
    ColumnShim.column(
      CmsMergeAgg(ColumnShim.expression(sketch)).toAggregateExpression())
}

/** Estimated count of `item` (BIGINT) in a serialized count-min
  * sketch — never an underestimate; overestimates bounded by
  * eps × total insertions with the sketch's configured confidence.
  * Deserializes per row: intended for GROUP-level sketch rows (a few
  * per query), not per-event scans.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate takes (sketch BINARY, item BIGINT), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any, item: Any): Any =
    estimate(sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])

  def estimate(sketch: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketch))
      .estimateCount(item)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cmsEst", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (s, i) => s"${ev.value} = $ref.estimate($s, $i);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cms_estimate"
}

object CmsEstimate {
  def apply(sketch: Column, item: Column): Column =
    ColumnShim.column(
      CmsEstimate(ColumnShim.expression(sketch), ColumnShim.expression(item)))
}
