package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native, codegen'd Catalyst
  * expression — the map-side pre-filter of `operators.BloomJoin`.
  *
  * Why custom: Spark's own `BloomFilterMightContain` is internal-only
  * (planted by the `InjectRuntimeFilter` rule when its thresholds and
  * selectivity heuristics fire, never user-invocable), and the public
  * alternative — a Scala UDF closing over the filter — drops out of
  * whole-stage codegen. This expression keeps the probe inside the
  * codegen'd scan stage: the serialized filter rides the expression
  * into the task binary (one copy per executor, like a broadcast) and
  * deserializes lazily once per instance.
  *
  * Contract: the child must be the SAME 64-bit hash family the filter
  * was built over (graft uses `xxhash64` of the join keys — making the
  * probe type-agnostic over any key tuple). Null hash → null (the row
  * cannot match an equi-join anyway). False positives pass — callers
  * must re-check exactly (BloomJoin's real join does); false negatives
  * cannot happen, which is what makes the pre-filter safe.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  require(bloomBytes.nonEmpty, "empty bloom filter payload")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain probes a BIGINT hash (xxhash64 the key first), " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any = contains(v.asInstanceOf[Long])

  def contains(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMc", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  // the Array payload compares by reference under the synthesized case
  // class equals, so two semantically identical probes would never be
  // `equals` — defeating Catalyst's semanticEquals-based reuse
  // (ReuseExchange, common-subexpression elimination); compare contents
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Column API. `hash` must be `xxhash64` of the same columns the
    * filter was built over.
    */
  def apply(hash: Column, bf: BloomFilter): Column =
    ColumnShim.column(
      BloomMightContain(ColumnShim.expression(hash), serialize(bf)))
}
