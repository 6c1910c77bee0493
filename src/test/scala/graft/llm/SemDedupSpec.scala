package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Similarity.semanticPairs/semanticDupGroups): the k=1
  * degeneracy is bit-equal to exact all-pairs (q60's oracle contract),
  * the production path (k>1) returns a subset of the exact pairs with
  * high planted-twin recall, runs deterministically under a fixed
  * seed, and the groups form is consistent with its pairs.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // the q34/q60 corpus recipe: sf0.001 embeddings + perturbed twins
  // (planted near-dups at cosine ≈ 0.997)
  private lazy val corpus: DataFrame = {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twins = emb
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + lit(0.005) *
            (pmod(col("vec_id") + i.cast("bigint") + 1, lit(7)) - 3).cast("double"))
          .as("embedding"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    base.unionByName(twins).localCheckpoint()
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSet

  private lazy val exact: Set[(Long, Long)] = {
    val l = corpus.select(col("vec_id").as("id_a"), col("embedding").as("__va"))
    val r = corpus.select(col("vec_id").as("id_b"), col("embedding").as("__vb"))
    pairSet(l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .filter(round(Similarity.cosine(col("__va"), col("__vb")), 9) >= 0.8))
  }

  test("k=1 (one cell) equals the exact all-pairs set") {
    val got = pairSet(Similarity.semanticPairs(corpus, tau = 0.8, k = 1,
      iters = 0, dim = graft.Tables.EmbeddingDim))
    assert(got === exact)
    assert(exact.nonEmpty) // the planted twins guarantee pairs exist
  }

  test("k=4 production path: subset of exact, twin recall >= 0.9, deterministic") {
    def run() = pairSet(Similarity.semanticPairs(corpus, tau = 0.8, k = 4,
      iters = 2, dim = graft.Tables.EmbeddingDim))
    val got = run()
    assert(got.subsetOf(exact), "cell-bounded pairs can never exceed the exact set")
    // planted twins (v, v+1M) are near-identical vectors: a learned
    // cell boundary between them means the base vector sits ON the
    // boundary — rare, so recall on the planted set must stay high
    val planted = exact.filter { case (a, b) => b == a + 1000000L }
    val caught = planted.count(got.contains)
    assert(planted.nonEmpty)
    assert(caught.toDouble / planted.size >= 0.9,
      s"twin recall ${caught.toDouble / planted.size}")
    assert(run() === got, "same seed must reproduce the same pair set")
  }

  test("groups keep each component's min id and cover exactly the paired ids") {
    val pairs = pairSet(Similarity.semanticPairs(corpus, tau = 0.8, k = 1,
      iters = 0, dim = graft.Tables.EmbeddingDim))
    val groups = Similarity.semanticDupGroups(corpus, tau = 0.8, k = 1,
      iters = 0, dim = graft.Tables.EmbeddingDim)
      .as[(Long, Long)].collect().toMap
    val pairedIds = pairs.flatMap(p => Seq(p._1, p._2))
    assert(groups.keySet === pairedIds)
    groups.foreach { case (id, keep) => assert(keep <= id) }
    // every pair's two ids share a component label
    pairs.foreach { case (a, b) => assert(groups(a) === groups(b)) }
  }
}
