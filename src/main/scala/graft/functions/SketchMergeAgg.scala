package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Shared scaffolding of the stored-sketch MERGE aggregates
  * ([[CmsMergeAgg]], [[HllSparseMergeAgg]]) — the per-day
  * pre-aggregate pattern's query-time half. The whole null protocol
  * lives HERE, once: the aggregation buffer is null until the first
  * non-null blob arrives, update/merge propagate null-ness, and
  * serialize/deserialize encode the null buffer as empty bytes (a
  * valid sketch blob is never empty in either codec). Concrete
  * aggregates supply only the codec and the in-place merge.
  */
abstract class SketchMergeAgg[T >: Null <: AnyRef]
    extends TypedImperativeAggregate[T] with UnaryLike[Expression] {

  /** Producer-function name used in the type-check error message. */
  protected def producerName: String
  protected def readSketch(bytes: Array[Byte]): T
  protected def writeSketch(sketch: T): Array[Byte]
  /** Merge `other` into `acc` (in place is fine); return the result. */
  protected def mergeInto(acc: T, other: T): T

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes the BINARY output of $producerName, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): T = null

  override def update(buffer: T, input: InternalRow): T = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val s = readSketch(v.asInstanceOf[Array[Byte]])
      if (buffer == null) s else mergeInto(buffer, s)
    }
  }

  override def merge(b1: T, b2: T): T =
    if (b1 == null) b2
    else if (b2 == null) b1
    else mergeInto(b1, b2)

  override def eval(buffer: T): Any =
    if (buffer == null) null else writeSketch(buffer)

  override def serialize(buffer: T): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else writeSketch(buffer)

  override def deserialize(bytes: Array[Byte]): T =
    if (bytes.isEmpty) null else readSketch(bytes)
}
