package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprints as a native Catalyst expression —
  * the PRODUCTION path of `TextOps.winnowingFingerprints`
  * (`GramHasher.XxHash64`).
  *
  * Why custom (SURVEY §7.3's "optional Catalyst" slot): the built-in
  * composition (`transform` gram hashes → `slice`+`array_min` per
  * window → `array_distinct`) runs in the INTERPRETED higher-order-
  * function evaluator and materializes one array per window — measured
  * no faster with xxhash64 than with md5, because the array churn, not
  * the hash, dominates. This expression is a single pass over the
  * string's bytes: rolling XXH64 gram hashes into a ring buffer, a
  * monotonic deque for the w-window minimum (amortized O(1) per
  * position), and a hash set for the distinct output — O(n) per
  * document, primitive longs throughout, no intermediate arrays.
  *
  * Value contract: bit-identical to the built-in composition with
  * `GramHasher.XxHash64` — gram hash = Spark's `xxhash64(substr(i,k))`
  * (XXH64 over the gram's bytes, seed 42), window minimum by SIGNED
  * long ordering (Spark's `array_min` on BIGINT), distinct in
  * first-occurrence order (`array_distinct`) — asserted in
  * WinnowingHashSpec. Inputs are the ALREADY-NORMALIZED ASCII text
  * (TextOps.normalized: [a-z0-9 ] only), so byte positions = character
  * positions; fewer than k chars or fewer than w grams → empty array;
  * null in → null out.
  */
case class WinnowHash(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"winnow_hash needs k >= 2, w >= 1 (got k=$k, w=$w)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_hash requires a STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[UTF8String])

  /** Public so generated code can call it (addReferenceObj below). */
  def compute(str: UTF8String): ArrayData = {
    val bytes = str.getBytes
    val nGrams = bytes.length - k + 1
    if (nGrams < w) return WinnowHash.Empty
    // ring buffer of the last w gram hashes + monotonic (increasing)
    // deque of candidate minima indices; LinkedHashSet preserves the
    // first-occurrence order array_distinct would produce
    val ring = new Array[Long](w)
    val cap = w + 1 // at most w live window indices + the incoming one
    val deque = new Array[Int](cap) // circular; head/tail are counters
    var head = 0; var tail = 0 // deque[head until tail) are live indices
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nGrams) {
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, k, 42L)
      ring(i % w) = h
      while (tail > head && ring(deque((tail - 1) % cap) % w) >= h) tail -= 1
      deque(tail % cap) = i; tail += 1
      if (deque(head % cap) <= i - w) head += 1
      if (i >= w - 1) out.add(ring(deque(head % cap) % w))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // keep the enclosing projection inside WholeStageCodegen: generated
    // code calls straight into compute() on this expression instance
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowHash =
    copy(child = newChild)

  override def prettyName: String = "winnow_hash"
}

/** One-pass winnowing with the ORACLE hash (md5 hex, string-ordered
  * minima) — the md5 twin of [[WinnowHash]], powering q38's measured
  * path with values bit-identical to the builtin
  * `charGramHashes`/`winnowSelect` composition (same md5 of the same
  * gram bytes, same lowercase hex, same string-order window minima —
  * hex of an unsigned digest compare — same first-occurrence
  * distinct; asserted in WinnowingHashSpec). The builtin pipeline
  * materializes one 32-char hex string per gram plus a sliced array
  * per window in the interpreted HOF evaluator; here grams are hashed
  * once into 16-byte digests, the window minimum runs on a monotonic
  * deque with unsigned digest compares, and only the selected minima
  * are hex-encoded.
  */
case class WinnowMd5(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"winnow_md5 needs k >= 2, w >= 1 (got k=$k, w=$w)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_md5 requires a STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // Per-THREAD digest, not per-expression-instance: executor tasks get
  // their own deserialized copy, but one driver-side instance can be
  // evaluated from several threads at once (interpreted eval / constant
  // folding under concurrent driver jobs), and MessageDigest is
  // stateful — sharing one would corrupt digests silently.
  @transient private lazy val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[UTF8String])

  def compute(str: UTF8String): ArrayData = {
    val md5 = md5Local.get()
    val bytes = str.getBytes
    val nGrams = bytes.length - k + 1
    if (nGrams < w) return WinnowHash.EmptyStr
    val ring = new Array[Array[Byte]](w)
    val cap = w + 1
    val deque = new Array[Int](cap)
    var head = 0; var tail = 0
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < nGrams) {
      md5.reset()
      md5.update(bytes, i, k)
      val h = md5.digest()
      ring(i % w) = h
      // hex(digest) string order == unsigned byte order of the digest
      while (tail > head &&
        java.util.Arrays.compareUnsigned(ring(deque((tail - 1) % cap) % w), h) >= 0)
        tail -= 1
      deque(tail % cap) = i; tail += 1
      if (deque(head % cap) <= i - w) head += 1
      if (i >= w - 1) out.add(WinnowHash.hex(ring(deque(head % cap) % w)))
      i += 1
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator(); var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowMd5", this, classOf[WinnowMd5].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMd5 =
    copy(child = newChild)

  override def prettyName: String = "winnow_md5"
}

object WinnowMd5 {
  /** Column API over an ALREADY normalized STRING column. */
  def apply(normText: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowMd5(ColumnShim.expression(normText), k, w))
}

object WinnowHash {
  private val Empty = new GenericArrayData(Array.emptyLongArray)
  private[functions] val EmptyStr = new GenericArrayData(Array.empty[Any])

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of a digest as UTF8String — matches Spark's `md5`. */
  private[functions] def hex(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](digest.length * 2)
    var i = 0
    while (i < digest.length) {
      out(2 * i) = HexChars((digest(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column-level API: `winnowHash(normText, k, w)` over an ALREADY
    * normalized STRING column.
    */
  def apply(normText: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowHash(ColumnShim.expression(normText), k, w))

  /** Make `winnow_hash(text, k, w)` callable from SQL text (k, w as
    * integer literals). Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_hash",
      exprs => {
        require(exprs.length == 3, s"winnow_hash takes 3 arguments, got ${exprs.length}")
        WinnowHash(exprs(0),
          graft.GraftExtensions.intLit(exprs(1), "winnow_hash k"),
          graft.GraftExtensions.intLit(exprs(2), "winnow_hash w"))
      },
      "built-in")
}
