package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native Catalyst expression — the hot map of
  * the MinHash-LSH near-dup path (`NearDup.minhashSignature`).
  *
  * Why custom (SURVEY §7.3's "optional Catalyst" slot): the builtin
  * composition (`aggregate` over shingles folding a numHashes-wide
  * running minimum via `zip_with`/`transform`) runs in the INTERPRETED
  * higher-order-function evaluator and allocates two numHashes-wide
  * arrays per shingle step. This expression is the same double loop as
  * tight JVM code: per-slot seeds precomputed once per expression
  * instance, one primitive-long minimum fold, zero per-step allocation.
  *
  * Value contract: bit-identical to the builtin composition —
  * `sig[h] = min over shingles s of xxhash64(lit(seed), h, s)`, which
  * Spark evaluates as
  * `hashUnsafeBytes(s, hashInt(h, hashLong(seed, 42)))` (child-fold
  * order of the XxHash64 expression; a null shingle leaves the running
  * hash at the slot seed, mirrored here). Empty or null shingle arrays
  * → null signature (no Jaccard identity), exactly like the `when`
  * guard this replaces. Asserted element-for-element in
  * NearDupNativeSpec — candidates, and therefore the q27/q36 oracle
  * results, cannot move.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes >= 1, s"minhash_sig needs numHashes >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // slot seeds: hashInt(h, hashLong(seed, 42)) — computed once
  @transient private lazy val slotSeeds: Array[Long] = {
    val base = XXH64.hashLong(seed, 42L)
    Array.tabulate(numHashes)(h => XXH64.hashInt(h, base))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  /** Public so generated code can call it (addReferenceObj below). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        // XxHash64 skips null children: the hash stays at the slot seed
        var h = 0
        while (h < numHashes) {
          if (slotSeeds(h) < sig(h)) sig(h) = slotSeeds(h); h += 1
        }
      } else {
        val s = arr.getUTF8String(i)
        val base = s.getBaseObject; val off = s.getBaseOffset; val len = s.numBytes
        var h = 0
        while (h < numHashes) {
          val v = XXH64.hashUnsafeBytes(base, off, len, slotSeeds(h))
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Column API over an ARRAY<STRING> shingle column. */
  def apply(shingles: Column, numHashes: Int, seed: Long): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(shingles), numHashes, seed))
}

/** 64-bit SimHash as a native Catalyst expression — the signature map
  * of the SimHash near-dup path (`NearDup.simhash64`).
  *
  * Value contract: bit-identical to the builtin composition — token
  * hash `xxhash64(lit(seed), t)` = `hashUnsafeBytes(t, hashLong(seed,
  * 42))`; bit b of the output is 1 iff the sum over tokens of ±1
  * (sign of bit b of the token hash) is positive. The interpreted
  * fold allocates a 64-wide vote array per token; here it's one long
  * loop over a primitive vote vector. Null tokens leave the running
  * hash at `hashLong(seed, 42)`, mirrored. Null token ARRAY → null.
  */
case class SimHash64(child: Expression, seed: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val baseSeed: Long = XXH64.hashLong(seed, 42L)

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) baseSeed
        else {
          val t = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, baseSeed)
        }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Column API over an ARRAY<STRING> token column. */
  def apply(tokens: Column, seed: Long): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens), seed))
}

/** 60-bit MD5-based SimHash — the ORACLE-REPRODUCIBLE twin of
  * `SimHash64`. The token hash is the numeric value of the first 15
  * hex chars of `md5(token)` (60 bits — the widest md5 prefix that
  * fits a SIGNED 64-bit int in every engine), i.e. exactly
  * `conv(substring(md5(t), 1, 15), 16, 10)` in Spark SQL and
  * `('0x' || substr(md5(t), 1, 15))::BIGINT` in DuckDB — so an
  * independent engine can rebuild the signature bit-for-bit, which
  * xxhash64-seeded `SimHash64` (Spark-internal hash) can never offer.
  * Same vote semantics over bits 0..59: bit b is 1 iff the sum over
  * tokens of ±1 (sign of bit b of the token hash) is positive. Null
  * token → hash 0 (votes −1 on every bit), mirrored in the builtin
  * twin; null token ARRAY → null.
  *
  * Production dedup stays on `SimHash64` (xxhash64 is one unseeded
  * 64-bit mix vs a full MD5 block per token); this expression exists
  * for cross-engine-checkable fingerprints (q78) and any pipeline that
  * must publish signatures other systems can recompute.
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Long = {
    val md = SimHashMd5.digest.get()
    val votes = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 0L
        else {
          md.reset()
          val d = md.digest(arr.getUTF8String(i).getBytes)
          // first 15 hex chars = top 60 bits of the first 8 bytes
          // (big-endian), dropping the low nibble of byte 7
          (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
            ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
            ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
        }
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashmd5", this, classOf[SimHashMd5].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)

  override def prettyName: String = "simhash_md5"
}

object SimHashMd5 {
  // MessageDigest is stateful and not thread-safe; one per task thread.
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column API over an ARRAY<STRING> token column. */
  def apply(tokens: Column): Column =
    ColumnShim.column(SimHashMd5(ColumnShim.expression(tokens)))
}
