package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}

/** GraftExtensions registry completeness: a SQL-only install
  * (`spark.sql.extensions=graft.GraftExtensions`) must see the FULL
  * native expression family — every custom Catalyst expression the
  * Scala API uses, with no Scala call required. The family list here
  * is the checklist; a new native expression that isn't registered
  * fails the first test.
  */
class GraftExtensionsSpec extends SparkSpec {

  // one entry per native Catalyst expression in graft.functions
  private val family = Seq(
    "vec_dot",            // VecDot
    "argmax_dot",         // ArgmaxDot
    "hyperplane_buckets", // HyperplaneBuckets
    "minhash_sig",        // MinHashSig
    "simhash64",          // SimHash64
    "simhash_md5",        // SimHashMd5
    "word_shingles",      // WordShingles
    "word_hits",          // WordHits
    "winnow_hash",        // WinnowHash
    "winnow_md5",         // WinnowMd5
    "bloom_might_contain", // BloomMightContain
    "rank_bucket",        // RankBucket
    "interleave_bits",    // InterleaveBits
    "cms_merge",          // CmsMergeAgg
    "cms_estimate",       // CmsEstimate
    "hll_sparse_agg",     // HllSparseAgg
    "hll_sparse_merge",   // HllSparseMergeAgg
    "hll_sparse_estimate") // HllSparseEstimate

  private def registry = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.graftshim.ColumnShim.applyFunctionExtensions(
      ext, org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
  }

  test("every native expression in graft.functions is SQL-registered") {
    val reg = registry
    family.foreach { f =>
      assert(reg.functionExists(FunctionIdentifier(f)),
        s"native expression '$f' is missing from GraftExtensions")
    }
  }

  test("array-parameter functions build from SQL-shaped args (CreateArray) and evaluate") {
    val reg = registry
    // SQL `array(array(1.0, 0.0), array(0.0, 1.0))` parses to nested
    // CreateArray — foldable, not Literal; the injection must fold it
    val cands = CreateArray(Seq(
      CreateArray(Seq(Literal(1.0d), Literal(0.0d))),
      CreateArray(Seq(Literal(0.0d), Literal(1.0d)))))
    val am = reg.lookupFunction(FunctionIdentifier("argmax_dot"),
      Seq(Literal.create(Array(0.9f, 0.1f)), cands))
    assert(am.eval(null) === 0, "probe (0.9, 0.1) is nearest candidate 0")
    val wh = reg.lookupFunction(FunctionIdentifier("word_hits"),
      Seq(Literal.create(Array("the", "cat", "the")),
        CreateArray(Seq(Literal("the")))))
    assert(wh.eval(null) === 2, "repeats count every time")
    val hb = reg.lookupFunction(FunctionIdentifier("hyperplane_buckets"),
      Seq(Literal.create(Array(1.0f, 2.0f)),
        Literal(8), Literal(2), Literal(42L), Literal(2)))
    assert(hb.eval(null) != null, "hyperplane_buckets must evaluate")
  }

  test("non-constant config arguments are rejected with a clear error") {
    val reg = registry
    val err = intercept[IllegalArgumentException] {
      reg.lookupFunction(FunctionIdentifier("word_shingles"),
        Seq(Literal.create(Array("a")),
          org.apache.spark.sql.catalyst.expressions.AttributeReference(
            "n", org.apache.spark.sql.types.IntegerType)()))
    }
    assert(err.getMessage.contains("n must be"))
  }
}
