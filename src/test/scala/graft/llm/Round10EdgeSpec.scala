package graft.llm

import graft.SparkSpec
import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the round-10 operators: empty corpora,
  * single rows, and all-identical inputs must produce empty/identity
  * results, never a crash or a spurious pair.
  */
class Round10EdgeSpec extends SparkSpec {
  import spark.implicits._

  test("prefixJaccardPairs: empty corpus and single doc produce no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(NearDup.prefixJaccardPairs(empty, "doc_id", "text", 0.5).collect().isEmpty)
    val one = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    assert(NearDup.prefixJaccardPairs(one, "doc_id", "text", 0.5).collect().isEmpty)
  }

  test("prefixJaccardPairs: n identical docs produce all C(n,2) pairs at jaccard 1") {
    val df = (1L to 5L).map((_, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val pairs = NearDup.prefixJaccardPairs(df, "doc_id", "text", 0.99)
      .as[(Long, Long, Double)].collect()
    assert(pairs.length === 10)
    assert(pairs.forall(_._3 === 1.0))
  }

  test("Cdc.diff: empty old is all inserts; empty new is all deletes; both empty is empty") {
    val base = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    val empty = Seq.empty[(Long, String, Double)].toDF("k", "s", "v")
    val ins = Cdc.diff(empty, base, Seq("k")).select("op").as[String].collect()
    assert(ins.toSeq === Seq("I"))
    val del = Cdc.diff(base, empty, Seq("k")).select("op").as[String].collect()
    assert(del.toSeq === Seq("D"))
    assert(Cdc.diff(empty, empty, Seq("k")).collect().isEmpty)
    assert(Cdc.diff(base, base, Seq("k")).collect().isEmpty)
  }

  test("Embeddings: single vector standardizes to zeros; gram of empty corpus is empty") {
    val one = Seq((1L, Array(2.0f, -3.0f))).toDF("vec_id", "embedding")
    val z = Embeddings.standardize(one)
      .select(col("embedding")).as[Seq[Double]].head()
    assert(z === Seq(0.0, 0.0)) // every dim constant -> std 0 -> 0
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Embeddings.gramExact(empty, 2).collect().isEmpty)
  }
}
