package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Keep-first dedup semantics (merge.py:38-39 / concat_embeddings.py:21-22):
  * earlier sources beat later ones, ties inside a source break by the
  * explicit order, and the winner's payload is preserved.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("unionKeepFirst: earlier source wins for shared keys") {
    val local   = Seq((1L, "local-a"), (2L, "local-b")).toDF("id", "payload")
    val central = Seq((2L, "central-b"), (3L, "central-c")).toDF("id", "payload")
    val out = Dedup.unionKeepFirst(Seq(local, central), Seq("id"), Seq(col("payload").asc))
      .orderBy("id").as[(Long, String)].collect()
    assert(out === Array((1L, "local-a"), (2L, "local-b"), (3L, "central-c")))
  }

  test("unionKeepFirst: priority dominates the within-source order") {
    // central's payload sorts BEFORE local's; priority must still win
    val local   = Seq((7L, "zzz")).toDF("id", "payload")
    val central = Seq((7L, "aaa")).toDF("id", "payload")
    val out = Dedup.unionKeepFirst(Seq(local, central), Seq("id"), Seq(col("payload").asc))
      .as[(Long, String)].collect()
    assert(out === Array((7L, "zzz")))
  }

  test("keepFirst: picks minimum under the given total order per key") {
    val df = Seq((1L, 3, "c"), (1L, 1, "a"), (1L, 2, "b"), (2L, 9, "z"))
      .toDF("id", "ord", "payload")
    val out = Dedup.keepFirst(df, Seq("id"), Seq(col("ord").asc))
      .orderBy("id").as[(Long, Int, String)].collect()
    assert(out === Array((1L, 1, "a"), (2L, 9, "z")))
  }

  test("exactByHash: groups identical content, keeps min id") {
    val df = Seq((10L, "same text"), (11L, "same text"), (12L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactByHash(df, "text", "doc_id")
      .orderBy("keep_id").select("keep_id", "n_copies").as[(Long, Long)].collect()
    assert(out === Array((10L, 2L), (12L, 1L)))
  }
}
