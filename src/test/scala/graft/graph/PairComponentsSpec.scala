package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `PropertyGraph.pairComponents` (the size-gated CC every dedup
  * group-forming op now routes through) must produce bitwise-identical
  * labels to the raw GraphX path it replaced at fixture scale — on the
  * REAL pair sets of the two driver-checked group queries (q36's
  * MinHash near-dup pairs, q60's SemDeDup pairs), not a toy graph.
  * Below the 2^20-edge gate the labels come from the driver union-find;
  * GraphX CC's contract (vertices = pair endpoints, label = min id per
  * component) is the function both paths compute.
  */
class PairComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def rawGraphX(pairs: DataFrame): Set[(Long, Long)] = {
    val edges = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].rdd.map { case (a, b) => org.apache.spark.graphx.Edge(a, b, ()) }
    org.apache.spark.graphx.Graph.fromEdges(edges, ())
      .connectedComponents().vertices.toDF("id", "keep_id")
      .as[(Long, Long)].collect().toSet
  }

  private def gated(pairs: DataFrame): Set[(Long, Long)] =
    PropertyGraph.pairComponents(pairs).as[(Long, Long)].collect().toSet

  test("labels equal raw GraphX on the q36 near-dup pair set") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val twins = t.documents.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      substring(col("text"), lit(1), greatest(length(col("text")) - 10, lit(1))).as("text"))
    val corpus = t.documents.select(col("doc_id"), col("text")).unionByName(twins)
    val pairs = graft.llm.NearDup.nearDupPairs(corpus, "doc_id", "text",
      threshold = 0.6, shingleN = 3, numHashes = 48, bands = 16)
      .localCheckpoint()
    val got = gated(pairs)
    assert(got.nonEmpty, "planted twins must produce pairs")
    assert(got === rawGraphX(pairs))
  }

  test("labels equal raw GraphX on the q60 SemDeDup pair set") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val base = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twins = t.embeddings
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + lit(0.005) *
            (pmod(col("vec_id") + i.cast("bigint") + 1, lit(7)) - 3).cast("double"))
          .as("embedding"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(twins)
    val pairs = graft.llm.Similarity.semanticPairs(corpus, tau = 0.8, k = 1,
      iters = 0).localCheckpoint()
    val got = gated(pairs)
    assert(got.nonEmpty)
    assert(got === rawGraphX(pairs))
  }
}
