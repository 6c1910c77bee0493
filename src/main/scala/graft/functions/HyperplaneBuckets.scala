package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Per-band random-hyperplane LSH buckets as a native Catalyst
  * expression — the signature map of the embedding LSH paths
  * (`Similarity.lshTopK` / `Similarity.cosinePairs`).
  *
  * Output: `array<long>` of length `bands`; bit jj of element b is the
  * sign bit of `vec · plane(b*bits + jj)` (bits = numPlanes / bands).
  *
  * Why custom: the builtin form runs numPlanes interpreted
  * `zip_with`+`aggregate` dot products per row (numPlanes × dim lambda
  * steps, two array allocations per plane). This is one tight
  * FMA double loop over the precomputed plane matrix.
  *
  * Value contract: bit-identical to the builtin composition —
  * plane components replicate `(pmod(xxhash64(lit(seed), j, d),
  * 2000000)/1e6) - 1` exactly (same catalyst XXH64, same fold order);
  * the dot product accumulates left-to-right in Double with per-element
  * Float→Double widening, and the bit is set iff the sum is `> 0`.
  * Mismatched vector length or any null element makes every builtin
  * plane dot NULL → all buckets 0; mirrored here. Deliberate
  * deviation: a null VECTOR yields a null result (the explode drops
  * the row — no candidates), where the builtin's transform-over-bands
  * yields all-zero buckets that would collide with legitimately
  * zero-bucket vectors. All asserted in HyperplaneNativeSpec, so LSH
  * candidate sets (and the q34 oracle) cannot move on any non-null
  * input.
  */
case class HyperplaneBuckets(child: Expression, numPlanes: Int, bands: Int,
                             seed: Long, dim: Int)
    extends UnaryExpression {
  require(numPlanes >= 1 && bands >= 1 && numPlanes % bands == 0,
    s"numPlanes=$numPlanes must be a positive multiple of bands=$bands")
  private val bits = numPlanes / bands
  require(bits <= 64, s"bits per band $bits exceeds a long")
  require(dim >= 1, s"dim must be positive, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires ARRAY<FLOAT>/ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // plane matrix flattened row-major: planes(j*dim + d), built once per
  // expression instance — identical values to Similarity.planeComponent
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](numPlanes * dim)
    var j = 0
    while (j < numPlanes) {
      var d = 0
      while (d < dim) {
        out(j * dim + d) = HyperplaneBuckets.planeComponent(j, d, seed)
        d += 1
      }
      j += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val buckets = new Array[Long](bands)
    val n = arr.numElements()
    // builtin twin semantics: length mismatch or any null element turns
    // every plane dot NULL -> bit unset -> all-zero buckets
    if (n != dim) return new GenericArrayData(buckets)
    val isFloat = elemIsFloat
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (arr.isNullAt(d)) return new GenericArrayData(buckets)
      v(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    var j = 0
    while (j < numPlanes) {
      var sum = 0.0
      val base = j * dim
      d = 0
      while (d < dim) { sum += v(d) * planes(base + d); d += 1 }
      if (sum > 0) buckets(j / bits) |= 1L << (j % bits)
      j += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyper", this, classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_buckets"
}

object HyperplaneBuckets {
  /** Deterministic pseudo-random hyperplane component in [-1, 1) for
    * (plane j, dimension d) — replicates what the Column expression
    * `(pmod(xxhash64(lit(seed), j, d), 2000000).cast("double") / 1e6)
    * - 1` evaluates to (same catalyst XXH64, same fold order, same
    * pmod), so native signatures are bit-identical to the expression
    * formulation (asserted in SimilaritySpec).
    */
  def planeComponent(j: Int, d: Int, seed: Long): Double = {
    val h = XXH64.hashInt(d, XXH64.hashInt(j, XXH64.hashLong(seed, 42L)))
    val m = 2000000L
    val pm = ((h % m) + m) % m
    (pm.toDouble / 1000000.0) - 1.0
  }

  /** Column API over an ARRAY<FLOAT>/ARRAY<DOUBLE> vector column. */
  def apply(vec: Column, numPlanes: Int, bands: Int, seed: Long, dim: Int): Column =
    ColumnShim.column(HyperplaneBuckets(
      ColumnShim.expression(vec), numPlanes, bands, seed, dim))
}
