package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArgmaxDot, BloomMightContain, CmsEstimate,
  CmsMergeAgg, HllSparseAgg, HllSparseEstimate, HllSparseMergeAgg,
  HyperplaneBuckets, InterleaveBits, MinHashSig, RankBucket,
  SimHash64, SimHashMd5, VecDot, WinnowHash, WinnowMd5, WordHits,
  WordShingles}

/** SparkSessionExtensions entry point (SURVEY §4.3's extension slot):
  * installs graft's native Catalyst functions into every session built
  * with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder.withExtensions(new GraftExtensions)`), so
  * `vec_dot` is available to pure-SQL users without any Scala call —
  * the same mechanism Delta/Iceberg use to register their surface.
  * `VecDot.register(spark)` remains for already-built sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"vec_dot takes 2 arguments, got ${exprs.length}")
        VecDot(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_hash"),
      new ExpressionInfo(classOf[WinnowHash].getName, "winnow_hash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, s"winnow_hash takes 3 arguments, got ${exprs.length}")
        WinnowHash(exprs(0), GraftExtensions.intLit(exprs(1), "k"),
          GraftExtensions.intLit(exprs(2), "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, s"minhash_sig takes 3 arguments, got ${exprs.length}")
        MinHashSig(exprs(0), GraftExtensions.intLit(exprs(1), "numHashes"),
          GraftExtensions.longLit(exprs(2), "seed"))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"simhash64 takes 2 arguments, got ${exprs.length}")
        SimHash64(exprs(0), GraftExtensions.longLit(exprs(1), "seed"))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"simhash_md5 takes 1 argument, got ${exprs.length}")
        SimHashMd5(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_md5"),
      new ExpressionInfo(classOf[WinnowMd5].getName, "winnow_md5"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, s"winnow_md5 takes 3 arguments, got ${exprs.length}")
        WinnowMd5(exprs(0), GraftExtensions.intLit(exprs(1), "k"),
          GraftExtensions.intLit(exprs(2), "w"))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"word_shingles takes 2 arguments, got ${exprs.length}")
        WordShingles(exprs(0), GraftExtensions.intLit(exprs(1), "n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_hits"),
      new ExpressionInfo(classOf[WordHits].getName, "word_hits"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"word_hits takes 2 arguments, got ${exprs.length}")
        WordHits(exprs(0), GraftExtensions.stringListLit(exprs(1), "words"))
      }))
    ext.injectFunction((
      FunctionIdentifier("argmax_dot"),
      new ExpressionInfo(classOf[ArgmaxDot].getName, "argmax_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"argmax_dot takes 2 arguments, got ${exprs.length}")
        ArgmaxDot(exprs(0), GraftExtensions.doubleMatrixLit(exprs(1), "candidates"))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"bloom_might_contain takes 2 arguments (bloomBytes, hash), got ${exprs.length}")
        BloomMightContain(exprs(1),
          GraftExtensions.binaryLit(exprs(0), "bloomBytes"))
      }))
    ext.injectFunction((
      FunctionIdentifier("rank_bucket"),
      new ExpressionInfo(classOf[RankBucket].getName, "rank_bucket"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"rank_bucket takes 2 arguments (value, boundaries), got ${exprs.length}")
        RankBucket(exprs(0),
          GraftExtensions.doubleArrayLit(exprs(1), "boundaries"))
      }))
    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"interleave_bits takes 2 arguments (buckets, bits), got ${exprs.length}")
        InterleaveBits(exprs(0), GraftExtensions.intLit(exprs(1), "bits"))
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_merge"),
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "cms_merge"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"cms_merge takes 1 argument, got ${exprs.length}")
        CmsMergeAgg(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cms_estimate takes 2 arguments (sketch, item), got ${exprs.length}")
        CmsEstimate(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_sparse_agg"),
      new ExpressionInfo(classOf[HllSparseAgg].getName, "hll_sparse_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1 || exprs.length == 3,
          s"hll_sparse_agg takes (value) or (value, tau, p), got ${exprs.length}")
        if (exprs.length == 1) HllSparseAgg(exprs(0))
        else HllSparseAgg(exprs(0), GraftExtensions.intLit(exprs(1), "tau"),
          GraftExtensions.intLit(exprs(2), "p"))
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_sparse_merge"),
      new ExpressionInfo(classOf[HllSparseMergeAgg].getName, "hll_sparse_merge"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"hll_sparse_merge takes 1 argument, got ${exprs.length}")
        HllSparseMergeAgg(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("hll_sparse_estimate"),
      new ExpressionInfo(classOf[HllSparseEstimate].getName, "hll_sparse_estimate"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"hll_sparse_estimate takes 1 argument, got ${exprs.length}")
        HllSparseEstimate(exprs(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 5,
          s"hyperplane_buckets takes 5 arguments (vec, numPlanes, bands, seed, dim), got ${exprs.length}")
        HyperplaneBuckets(exprs(0), GraftExtensions.intLit(exprs(1), "numPlanes"),
          GraftExtensions.intLit(exprs(2), "bands"),
          GraftExtensions.longLit(exprs(3), "seed"),
          GraftExtensions.intLit(exprs(4), "dim"))
      }))
  }
}

object GraftExtensions {
  // config parameters of the native functions must be plan-time
  // constants (they size per-instance precomputed state)
  private[graft] def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                            name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an INT literal, got $other")
  }

  private[graft] def binaryLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                               name: String): Array[Byte] = e match {
    case other if other.foldable &&
        other.dataType == org.apache.spark.sql.types.BinaryType =>
      val v = other.eval(null)
      require(v != null, s"$name must not be null")
      v.asInstanceOf[Array[Byte]]
    case other => throw new IllegalArgumentException(
      s"$name must be a BINARY literal, got $other")
  }

  private[graft] def longLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                             name: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
      org.apache.spark.sql.types.LongType) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  // SQL callers write `array('a', 'b')` / `array(array(1.0, 2.0))` —
  // CreateArray nodes, not Literals, but FOLDABLE: fold via a cast to
  // the canonical element type and eval at plan-build time.
  private def foldedArray(e: org.apache.spark.sql.catalyst.expressions.Expression,
                          elem: org.apache.spark.sql.types.DataType,
                          name: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    require(e.foldable, s"$name must be a constant array, got $e")
    val casted = org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.ArrayType(elem))
    val v = casted.eval(null)
    require(v != null, s"$name must not be null")
    v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
  }

  private[graft] def stringListLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      name: String): Seq[String] = {
    val arr = foldedArray(e, org.apache.spark.sql.types.StringType, name)
    (0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i), s"$name must not contain nulls")
      arr.getUTF8String(i).toString
    }
  }

  private[graft] def doubleArrayLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      name: String): Array[Double] = {
    val arr = foldedArray(e, org.apache.spark.sql.types.DoubleType, name)
    Array.tabulate(arr.numElements()) { i =>
      require(!arr.isNullAt(i), s"$name must not contain nulls")
      arr.getDouble(i)
    }
  }

  private[graft] def doubleMatrixLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      name: String): Seq[Seq[Double]] = {
    val inner = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType)
    val arr = foldedArray(e, inner, name)
    (0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i), s"$name must not contain null rows")
      arr.getArray(i).toDoubleArray().toSeq
    }
  }
}
