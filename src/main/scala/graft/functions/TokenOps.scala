package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a native Catalyst expression — the builder
  * feeding MinHash/repetition (`TextOps.wordShingles`).
  *
  * Why custom: the builtin form (`slice` × n → `arrays_zip` →
  * interpreted `transform` with `concat_ws`) allocates n sliced arrays
  * plus a struct row per shingle position. This is one pass over the
  * token array concatenating n consecutive tokens per position.
  *
  * Value contract: identical to the builtin — shingle i =
  * tokens[i..i+n-1] joined by single spaces; fewer than n tokens →
  * empty array; null tokens array → null. A null ELEMENT renders as
  * the builtin `concat_ws` does: skipped entirely (concat_ws drops
  * nulls), asserted in TokenOpsNativeSpec.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_shingles needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val total = arr.numElements()
    val m = total - (n - 1)
    if (m <= 0) return WordShingles.Empty
    val space = UTF8String.fromString(" ")
    val out = new Array[UTF8String](m)
    // ONE window buffer reused across positions (concatWs is a Java
    // varargs method, so the array passes through uncopied): null
    // slots stay null and concatWs SKIPS them — exactly the
    // concat_ws drop-nulls contract — where the old loop allocated an
    // ArrayList plus a toArray copy per shingle position
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        buf(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, buf: _*)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Column API over an ARRAY<STRING> token column. */
  def apply(tokens: Column, n: Int): Column =
    ColumnShim.column(WordShingles(ColumnShim.expression(tokens), n))
}

/** Multiset membership count as a native expression — `TextOps
  * .wordHits` (stopword/marker hits for quality scoring and language
  * ID). The builtin `size(filter(toks, t -> array_contains(lit, t)))`
  * interprets a lambda per token and scans the word list linearly;
  * this is a hash-set lookup per token.
  *
  * Value contract: count of non-null tokens equal to any word in the
  * fixed list (repeats count every time); null array → null — same as
  * the builtin composition (array_contains against non-null literals
  * is false for a null probe, so nulls never count).
  */
case class WordHits(child: Expression, words: Seq[String]) extends UnaryExpression {
  require(words.nonEmpty, "word_hits needs a non-empty word list")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_hits requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && wordSet.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hits", this, classOf[WordHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordHits =
    copy(child = newChild)

  override def prettyName: String = "word_hits"
}

object WordHits {
  /** Column API over an ARRAY<STRING> token column. */
  def apply(tokens: Column, words: Seq[String]): Column =
    ColumnShim.column(WordHits(ColumnShim.expression(tokens), words))
}
