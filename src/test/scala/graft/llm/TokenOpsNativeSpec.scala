package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native WordShingles / WordHits must reproduce the builtin
  * compositions exactly — they feed the MinHash oracle path (q27/q36)
  * and the oracle-checked quality/lang-id queries (q20, q22, q23).
  */
class TokenOpsNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native WordShingles == builtin composition on sf0.01 documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val native = docs
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val generic = docs
      .select(col("doc_id"), TextOps.wordShinglesGeneric(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native.keySet === generic.keySet)
    native.foreach { case (id, sh) =>
      assert(sh === generic(id), s"doc $id shingles diverge")
    }
    docs.unpersist(blocking = false)
  }

  test("native WordShingles edges: short text, exact boundary, empty") {
    for (text <- Seq("a b c d", "a b c", "a b", "", "   ", "one")) {
      val n = Seq(text).toDF("t")
        .select(TextOps.wordShingles(col("t"), 3).as("s")).head().getSeq[String](0)
      val g = Seq(text).toDF("t")
        .select(TextOps.wordShinglesGeneric(col("t"), 3).as("s")).head().getSeq[String](0)
      assert(n === g, s"diverge on '$text'")
    }
  }

  test("native WordHits == builtin composition on sf0.01 documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks")).localCheckpoint()
    val words = TextOps.EnglishStopwords
    val native = docs
      .select(col("doc_id"), TextOps.wordHits(col("toks"), words).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val generic = docs
      .select(col("doc_id"), TextOps.wordHitsGeneric(col("toks"), words).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native === generic)
    assert(native.valuesIterator.exists(_ > 0))
    docs.unpersist(blocking = false)
  }
}
