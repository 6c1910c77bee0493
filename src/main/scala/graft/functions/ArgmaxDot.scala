package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Argmax of dot products against a fixed vector set, as a native
  * Catalyst expression — the per-row assignment step of the k-means
  * quantizer trainer (`Similarity.kmeansCentroids`).
  *
  * Why custom: the builtin form folds a struct accumulator over an
  * interpreted `aggregate`, with an inner `zip_with`+`aggregate` dot
  * per candidate — k × dim lambda steps and two array allocations per
  * candidate per row. This is the same double loop in primitive code.
  *
  * Value contract: identical to the builtin fold — dots accumulate
  * left-to-right in Double over the row vector (cast to double) and
  * candidate j, a candidate wins only on a STRICT `>` (first max keeps
  * ties), and a row whose vector length mismatches the candidates or
  * contains a null element yields -1 (every builtin dot is NULL, so
  * the initial (MinValue, -1) accumulator survives). Null vector →
  * null (builtin: the fold itself is null). Asserted in
  * KmeansNativeSpec.
  */
case class ArgmaxDot(child: Expression, cands: Seq[Seq[Double]])
    extends UnaryExpression {
  require(cands.nonEmpty && cands.forall(_.length == cands.head.length),
    "argmax_dot needs a non-empty, rectangular candidate set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmax_dot requires ARRAY<FLOAT>/ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  private val dim = cands.head.length

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // flattened row-major candidate matrix
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](cands.length * dim)
    var j = 0
    while (j < cands.length) {
      var d = 0
      while (d < dim) { out(j * dim + d) = cands(j)(d); d += 1 }
      j += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n != dim) return -1
    val isFloat = elemIsFloat
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (arr.isNullAt(d)) return -1
      v(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    var best = Double.MinValue
    var bestIdx = -1
    var j = 0
    while (j < cands.length) {
      var sum = 0.0
      val base = j * dim
      d = 0
      while (d < dim) { sum += v(d) * flat(base + d); d += 1 }
      if (sum > best) { best = sum; bestIdx = j }
      j += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argmax", this, classOf[ArgmaxDot].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArgmaxDot =
    copy(child = newChild)

  override def prettyName: String = "argmax_dot"
}

object ArgmaxDot {
  /** Column API over an ARRAY<FLOAT>/ARRAY<DOUBLE> vector column. */
  def apply(vec: Column, cands: Seq[Seq[Double]]): Column =
    ColumnShim.column(ArgmaxDot(ColumnShim.expression(vec), cands))
}
