package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G5 — UniformRandomWalk / UnsupervisedSampler parity
  * (models/unsupervised.py:43-46: `UnsupervisedSampler(G, nodes=nodes,
  * length=5, number_of_walks=1)`).
  *
  * Walks are built iteratively: `length-1` adjacency joins, each step
  * picking `neighbors[xxhash64(seed, walkId, step, cur) mod degree]` —
  * declarative, deterministic under any partitioning, no UDFs. A walk
  * ends early at a neighbor-less node (only possible at an isolated
  * start, since traversal follows undirected adjacency).
  *
  * Training pairs follow the reference sampler's shape: positives
  * `(walk[0], walk[i]) i=1..len-1` labeled 1; one uniformly sampled
  * global negative per positive labeled 0 (the reference smooths the
  * negative distribution by degree^0.75; uniform is the documented
  * deviation — same pair schema, same cardinality).
  *
  * Scale: `length-1` shuffle joins against adjacency; walk state is
  * (ids + fixed-length array), linear in |V|·length. No collects.
  */
object RandomWalk {

  /** One walk per (start × walkIdx): `(walk_id LONG, walk ARRAY<LONG>)`
    * where `walk(0)` is the start node and |walk| ≤ length.
    */
  def uniformWalks(g: PropertyGraph, length: Int, nWalks: Int, seed: Long,
                   maxDegree: Int = Int.MaxValue): DataFrame = {
    require(length >= 1 && nWalks >= 1)
    val spark = g.nodes.sparkSession
    val adjacency = g.adjacency(maxDegree)
    // walk_id encodes (start, walkIdx) deterministically
    var state = g.nodeIds
      .crossJoin(spark.range(nWalks).select(col("id").as("w")))
      .select((col("id") * nWalks + col("w")).as("walk_id"),
        col("id").as("cur"), array(col("id")).as("walk"))
    for (step <- 1 until length) {
      state = state
        .join(adjacency.withColumnRenamed("id", "cur"), Seq("cur"), "left")
        .withColumn("__next",
          when(col("cur").isNull || col("neighbors").isNull || size(col("neighbors")) === 0, lit(null))
            .otherwise(element_at(col("neighbors"),
              (pmod(xxhash64(lit(seed), col("walk_id"), lit(step), col("cur")),
                size(col("neighbors"))) + 1).cast("int"))))
        .select(col("__next").as("cur"),
          col("walk_id"),
          when(col("__next").isNull, col("walk"))
            .otherwise(concat(col("walk"), array(col("__next")))).as("walk"))
    }
    state.select(col("walk_id"), col("walk"))
  }

  /** UnsupervisedSampler pairs: `(target, context, label)` — positives
    * from walk co-occurrence, equal-count uniform negatives.
    */
  def unsupervisedPairs(g: PropertyGraph, length: Int, nWalks: Int,
                        seed: Long, maxDegree: Int = Int.MaxValue): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val walks = uniformWalks(g, length, nWalks, seed, maxDegree)
    val pos = walks
      .select(col("walk_id"), element_at(col("walk"), 1).as("target"),
        posexplode(slice(col("walk"), 2, length - 1)).as(Seq("__i", "context")))
      .select(col("walk_id"), col("__i"), col("target"), col("context"),
        lit(1).as("label"))
    // negatives: same (walk_id, slot) identity, context drawn uniformly
    // from the node list via a hash-ranked join on a random index
    val n = g.numNodes
    val idx = g.nodeIds.orderBy("id").rdd.map(_.getLong(0))
      .zipWithIndex().map(_.swap).toDF("__idx", "context")
    val neg = pos
      .select(col("walk_id"), col("__i"), col("target"),
        pmod(xxhash64(lit(seed + 17), col("walk_id"), col("__i")), lit(n)).as("__idx"))
      .join(idx, Seq("__idx"))
      .select(col("walk_id"), col("__i"), col("target"), col("context"),
        lit(0).as("label"))
    pos.unionByName(neg).select("target", "context", "label")
  }
}
