package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native HyperplaneBuckets expression must reproduce the builtin
  * compositions bit-for-bit — it feeds the LSH band join, so value
  * drift would silently move candidate sets (and the q34 oracle
  * equality with the exact all-pairs cosine set).
  */
class HyperplaneNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native buckets == builtin composition on sf0.01 embeddings (80 planes/8 bands)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val native = emb
      .select(col("vec_id"), graft.functions.HyperplaneBuckets(
        col("embedding"), 80, 8, 42L, 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val generic = emb
      .select(col("vec_id"),
        Similarity.cosineBandBucketsGeneric(col("embedding"), 80, 8, 42L, 64).as("bb"))
      .select(col("vec_id"), col("bb.bucket").as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet === generic.keySet)
    native.foreach { case (id, b) =>
      assert(b === generic(id), s"vec $id buckets diverge")
    }
    emb.unpersist(blocking = false)
  }

  test("native buckets == single-long signature slicing (64 planes/8 bands)") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.99f, 0.1f, 0f, 0f)),
      (3L, Array(-1f, 0f, 0f, 0f)),
      (4L, Array(0.3f, -0.7f, 0.2f, 0.9f))
    ).toDF("vec_id", "embedding")
    val bits = 64 / 8
    val fromSig = df.select(col("vec_id"),
        Similarity.hyperplaneSignature(col("embedding"), 64, 42L, dim = 4).as("sig"))
      .select(col("vec_id"), transform(sequence(lit(0), lit(7)),
        b => call_function("shiftrightunsigned", col("sig"), (b * bits).cast("int"))
          .bitwiseAND(lit((1L << bits) - 1))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = df.select(col("vec_id"), graft.functions.HyperplaneBuckets(
        col("embedding"), 64, 8, 42L, 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === fromSig)
  }

  test("edge semantics match the builtin: length mismatch and null element -> zero buckets") {
    val df = Seq(
      (1L, Some(Seq(Some(1f), Some(2f)))),            // dim mismatch (expr dim 4)
      (2L, Some(Seq(Some(1f), None, Some(2f), Some(3f)))), // null element
      (3L, None: Option[Seq[Option[Float]]])          // null vector
    ).toDF("vec_id", "embedding")
    val native = df.select(col("vec_id"), graft.functions.HyperplaneBuckets(
        col("embedding"), 16, 4, 42L, 4).as("b"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    val generic = df.select(col("vec_id"),
        Similarity.cosineBandBucketsGeneric(col("embedding"), 16, 4, 42L, 4).as("bb"))
      .select(col("vec_id"), col("bb.bucket").as("b"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    // non-null vectors: identical zero buckets
    assert(native(1L) === generic(1L) && native(1L).get.forall(_ == 0L))
    assert(native(2L) === generic(2L) && native(2L).get.forall(_ == 0L))
    // null vector: native null-propagates (explode drops the row — no
    // candidates), a documented deviation from the builtin's all-zero
    // buckets which would collide with legitimately zero-bucket vectors
    assert(native(3L).isEmpty)
    assert(generic(3L).exists(_.forall(_ == 0L)))
  }
}
