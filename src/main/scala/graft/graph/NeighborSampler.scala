package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G4 — GraphSAGELinkGenerator-style fixed-size neighbor sampling
  * (models/supervised.py:79-85: `num_samples=[20,10]`, with replacement).
  *
  * Declarative and deterministic: every sampled slot is
  * `neighbors[xxhash64(seed, exampleId, node, level, slot) mod degree]`
  * — a pure projection over the adjacency join, so the result is
  * reproducible under any partitioning/shuffle order, stays inside
  * whole-stage codegen (no UDFs), and two occurrences of the same node
  * in different examples sample independently (like the reference's
  * per-batch sampling).
  *
  * Nodes with no neighbors sample the sentinel `-1`, which the feature
  * lookup maps to a zero vector (StellarGraph pads the same way).
  *
  * Scale: one shuffle join per layer against the adjacency table; hub
  * skew is bounded by `PropertyGraph.adjacency(maxDegree)` and AQE skew
  * handling. Nothing collects.
  */
object NeighborSampler {

  /** `transform(sequence(0,k-1), slot -> sampled neighbor)` — k samples
    * with replacement out of `neighbors`, or `-1`s when empty/null.
    */
  private def sampleK(neighbors: Column, k: Int, seed: Long, level: Int,
                      exampleId: Column, node: Column): Column = {
    val slots = sequence(lit(0), lit(k - 1))
    when(neighbors.isNull || size(neighbors) === 0,
      transform(slots, _ => lit(-1L)))
      .otherwise(transform(slots, slot =>
        element_at(neighbors,
          (pmod(xxhash64(lit(seed), exampleId, node, lit(level), slot),
            size(neighbors)) + 1).cast("int"))))
  }

  /** Sample `k` neighbors (with replacement) for `input(nodeCol)`;
    * appends column `samples ARRAY<LONG>`. `exampleIdCol` keeps repeated
    * nodes independent across examples.
    */
  def sampleNeighbors(input: DataFrame, nodeCol: String, exampleIdCol: String,
                      adjacency: DataFrame, k: Int, level: Int, seed: Long): DataFrame =
    input
      .join(adjacency.withColumnRenamed("id", nodeCol), Seq(nodeCol), "left")
      .withColumn("samples",
        sampleK(col("neighbors"), k, seed, level, col(exampleIdCol), col(nodeCol)))
      .drop("neighbors")

  /** Full per-root sample tree for a 2-layer GraphSAGE:
    * input `(exampleIdCol, nodeCol)` → `(exampleId, node,
    * layer1 ARRAY<LONG>[k1], layer2 ARRAY<LONG>[k1*k2])`, where
    * `layer2[i*k2+j]` is the j-th sample of `layer1[i]` (the flat
    * row-major layout the mean-aggregator consumes).
    *
    * One output row per DISTINCT (exampleId, node): sampling is a
    * pure function of that pair, so duplicate input rows carry zero
    * information and collapse to one row — the `array_distinct` in
    * the regroup keeps their doubled slot structs from corrupting
    * layer2 to 2·k1·k2 entries (round-18 review).
    */
  def sampleTree2(input: DataFrame, nodeCol: String, exampleIdCol: String,
                  adjacency: DataFrame, k1: Int, k2: Int, seed: Long): DataFrame = {
    val l1 = sampleNeighbors(input, nodeCol, exampleIdCol, adjacency, k1, level = 1, seed)
      .withColumnRenamed("samples", "layer1")
    // explode layer1 keeping slot order, sample k2 per sampled node,
    // regroup sorted by slot and flatten — slot is carried through the
    // shuffle so the regroup is order-independent.
    val exploded = l1.select(col(exampleIdCol), col(nodeCol), col("layer1"),
      posexplode(col("layer1")).as(Seq("__slot", "__n1")))
    val l2 = exploded
      .join(adjacency.withColumnRenamed("id", "__n1"), Seq("__n1"), "left")
      .withColumn("__sub",
        sampleK(col("neighbors"), k2, seed ^ 0x9e3779b97f4a7c15L, 2,
          // (exampleId, slot) hashed as a struct: parallel slots of the
          // same node sample independently with no arithmetic-mixing
          // collisions (ids 10007 apart no longer share slot streams)
          struct(col(exampleIdCol), col("__slot")), col("__n1")))
      .groupBy(col(exampleIdCol), col(nodeCol), col("layer1"))
      // array_distinct: slots are unique per tower (posexplode index),
      // so the only duplicates are whole (slot, sub) structs from
      // duplicated input rows — identical by determinism, dropped here
      .agg(flatten(array_sort(array_distinct(
          collect_list(struct(col("__slot"), col("__sub")))))
        .getField("__sub")).as("layer2"))
    l2.select(col(exampleIdCol), col(nodeCol), col("layer1"), col("layer2"))
  }
}
