package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Mergeable distinct-count sketch with an EXACT sparse mode — the
  * q59 HLL deployment shape (per-day sketches persisted, merged at
  * query time) made oracle-checkable in its low-cardinality regime:
  *
  *   - SPARSE: below `tau` distinct 64-bit hashes the sketch IS the
  *     sorted hash set. Its estimate is the set size — VALUE-DEFINED
  *     (= exact COUNT(DISTINCT x), hash collisions aside — seeded
  *     xxhash64 over n ≤ tau = 2¹² longs collides with probability
  *     ~n²/2⁶⁵ ≈ 10⁻¹³, and deterministically so), and merging is set
  *     union — order-independent. This is how real HLL
  *     implementations behave below their sparse threshold; it is
  *     what lets q96 carry a full DuckDB oracle while q59's register
  *     estimates cannot.
  *   - DENSE: past `tau` the set converts to a classic 2^p-register
  *     HyperLogLog (Flajolet et al. 2007: register j keeps the max
  *     leading-zero rank of hashes routed to it; estimate
  *     α·m²/Σ2^(−M[j]) with the small-range linear-counting
  *     correction). Registers merge by elementwise max — still
  *     order-independent, accuracy ~1.04/√m, no longer value-defined.
  *
  * The transition is one-way and happens during update OR merge, so a
  * union of many just-under-tau days degrades exactly when it should.
  * Memory: sparse ≤ 8·tau bytes, dense = 2^p bytes — the per-group
  * exchange carries a few KB either way, never member ids at scale.
  */
object HllSparse {
  val DefaultTau = 4096
  val DefaultP = 12
  private val HashSeed = 42L

  /** Valid register-count exponents: p ≥ 7 keeps the α constant's
    * m ≥ 128 validity floor; p ≤ 24 caps a dense sketch at 16 MB (and
    * keeps `p.toByte` serialization lossless). Outside this band the
    * old code failed FAR from the caller — p = 31 allocated a negative
    * array size at the 4097th distinct value, p ≥ 32 wrapped the shift
    * and silently corrupted every estimate.
    */
  val MinP = 7
  val MaxP = 24

  /** Mutable aggregation buffer: `set == null` means dense. */
  final class Buf(val tau: Int, val p: Int) {
    require(p >= MinP && p <= MaxP,
      s"hll_sparse: p must be in [$MinP, $MaxP], got $p")
    require(tau >= 0, s"hll_sparse: tau must be >= 0, got $tau")
    var set: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet[java.lang.Long]()
    var regs: Array[Byte] = _

    def addValue(v: Long): Unit = addHash(XXH64.hashLong(v, HashSeed))

    def addHash(h: Long): Unit =
      if (set != null) {
        set.add(h)
        if (set.size > tau) toDense()
      } else denseAdd(h)

    private def denseAdd(h: Long): Unit = {
      val idx = (h >>> (64 - p)).toInt
      // rank = leading zeros of the remaining 64-p bits, + 1
      val w = h << p
      val rho = (if (w == 0L) 64 - p else math.min(
        java.lang.Long.numberOfLeadingZeros(w), 64 - p)) + 1
      if (rho > regs(idx)) regs(idx) = rho.toByte
    }

    private def toDense(): Unit = {
      regs = new Array[Byte](1 << p)
      val it = set.iterator()
      set = null
      while (it.hasNext) denseAdd(it.next())
    }

    def mergeIn(o: Buf): Unit = {
      require(o.p == p && o.tau == tau,
        s"incompatible hll_sparse sketches: (p=$p,tau=$tau) vs (p=${o.p},tau=${o.tau})")
      if (o.set != null) {
        val it = o.set.iterator()
        while (it.hasNext) addHash(it.next())
      } else {
        if (set != null) toDense()
        var i = 0
        while (i < regs.length) {
          if (o.regs(i) > regs(i)) regs(i) = o.regs(i)
          i += 1
        }
      }
    }

    def estimate: Long =
      if (set != null) set.size.toLong
      else {
        val m = 1 << p
        var sum = 0.0; var zeros = 0; var i = 0
        while (i < m) {
          sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
          if (regs(i) == 0) zeros += 1
          i += 1
        }
        val alpha = 0.7213 / (1.0 + 1.079 / m) // m = 4096 >= 128
        val e = alpha * m * m / sum
        val corrected =
          if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
          else e
        math.round(corrected)
      }

    /** mode byte (0 sparse / 1 dense), p, int tau, then payload. */
    def serialize: Array[Byte] = {
      val bb =
        if (set != null) {
          val b = java.nio.ByteBuffer.allocate(1 + 1 + 4 + 4 + 8 * set.size)
          b.put(0: Byte).put(p.toByte).putInt(tau).putInt(set.size)
          val it = set.iterator()
          while (it.hasNext) b.putLong(it.next())
          b
        } else {
          val b = java.nio.ByteBuffer.allocate(1 + 1 + 4 + regs.length)
          b.put(1: Byte).put(p.toByte).putInt(tau).put(regs)
          b
        }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val b = java.nio.ByteBuffer.wrap(bytes)
    val mode = b.get(); val p = b.get().toInt; val tau = b.getInt()
    val buf = new Buf(tau, p)
    if (mode == 0) {
      val n = b.getInt()
      var i = 0
      while (i < n) { buf.set.add(b.getLong()); i += 1 }
    } else {
      buf.set = null
      buf.regs = new Array[Byte](1 << p)
      b.get(buf.regs)
    }
    buf
  }
}

/** Aggregate BIGINT values into a serialized sparse-HLL sketch. */
case class HllSparseAgg(child: Expression,
                        tau: Int = HllSparse.DefaultTau,
                        p: Int = HllSparse.DefaultP,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllSparse.Buf] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if p < HllSparse.MinP || p > HllSparse.MaxP =>
      TypeCheckResult.TypeCheckFailure(
        s"hll_sparse_agg: p must be in [${HllSparse.MinP}, ${HllSparse.MaxP}], got $p")
    case LongType if tau < 0 =>
      TypeCheckResult.TypeCheckFailure(s"hll_sparse_agg: tau must be >= 0, got $tau")
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sparse_agg takes BIGINT, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllSparse.Buf = new HllSparse.Buf(tau, p)

  override def update(buffer: HllSparse.Buf, input: InternalRow): HllSparse.Buf = {
    val v = child.eval(input)
    if (v != null) buffer.addValue(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: HllSparse.Buf, b2: HllSparse.Buf): HllSparse.Buf = {
    b1.mergeIn(b2); b1
  }

  override def eval(buffer: HllSparse.Buf): Any = buffer.serialize
  override def serialize(buffer: HllSparse.Buf): Array[Byte] = buffer.serialize
  override def deserialize(bytes: Array[Byte]): HllSparse.Buf = HllSparse.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSparseAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSparseAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSparseAgg =
    copy(child = newChild)

  override def prettyName: String = "hll_sparse_agg"
}

object HllSparseAgg {
  def apply(value: Column): Column =
    ColumnShim.column(HllSparseAgg(
      ColumnShim.expression(value)).toAggregateExpression())
  def apply(value: Column, tau: Int, p: Int): Column =
    ColumnShim.column(HllSparseAgg(
      ColumnShim.expression(value), tau, p).toAggregateExpression())
}

/** Merge stored sparse-HLL sketch blobs (the per-day pre-aggregate
  * pattern: q59's hll_union_agg, for this sketch).
  */
case class HllSparseMergeAgg(child: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends SketchMergeAgg[HllSparse.Buf] {

  override protected def producerName: String = "hll_sparse_agg"

  override protected def readSketch(bytes: Array[Byte]): HllSparse.Buf =
    HllSparse.deserialize(bytes)

  override protected def writeSketch(sketch: HllSparse.Buf): Array[Byte] =
    sketch.serialize

  override protected def mergeInto(acc: HllSparse.Buf,
                                   other: HllSparse.Buf): HllSparse.Buf = {
    acc.mergeIn(other); acc
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSparseMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSparseMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSparseMergeAgg =
    copy(child = newChild)

  override def prettyName: String = "hll_sparse_merge"
}

object HllSparseMergeAgg {
  def apply(sketch: Column): Column =
    ColumnShim.column(HllSparseMergeAgg(
      ColumnShim.expression(sketch)).toAggregateExpression())
}

/** Cardinality estimate of a serialized sparse-HLL sketch: exact set
  * size in sparse mode (the oracle-checkable regime), HLL estimate in
  * dense mode.
  */
case class HllSparseEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sparse_estimate takes BINARY, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any): Any =
    estimate(sketch.asInstanceOf[Array[Byte]])

  def estimate(bytes: Array[Byte]): Long = HllSparse.deserialize(bytes).estimate

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("hllEst", this, classOf[HllSparseEstimate].getName)
    defineCodeGen(ctx, ev, s => s"$ref.estimate($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): HllSparseEstimate =
    copy(child = newChild)

  override def prettyName: String = "hll_sparse_estimate"
}

object HllSparseEstimate {
  def apply(sketch: Column): Column =
    ColumnShim.column(HllSparseEstimate(ColumnShim.expression(sketch)))
}
