package graft.graph

import graft.SparkSpec
import graft.etl.MergePipeline
import org.apache.spark.sql.functions._

/** G3 invariants (models/supervised.py:67-77 semantics): exact positive
  * count, connectivity preserved, |neg| = |pos|, negatives are true
  * non-edges, determinism under seed, and the double-split pattern.
  */
class EdgeSplitterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cora: PropertyGraph = {
    val m = MergePipeline.merge(spark, "/root/reference/data", "/root/reference/data", "4", "0")
    PropertyGraph(m.nodes.cache(), m.edges.cache())
  }

  test("split takes floor(p*|E|) positives and equal negatives") {
    val s = EdgeSplitter.trainTestSplit(cora, 0.1, seed = 42)
    assert(s.numPositives === 283L) // floor(0.1 * 2837)
    assert(s.examples.filter(col("label") === 1).count() === 283L)
    assert(s.examples.filter(col("label") === 0).count() === 283L)
    assert(s.residual.numEdges === 2837L - 283L)
  }

  test("size-gated CC: driver union-find equals the GraphX Pregel labels exactly") {
    // non-contiguous ids, several components, isolated nodes, cycles
    val rng = new scala.util.Random(5)
    val ids = (0 until 300).map(i => i.toLong * 3 + 7)
    val nodes = ids.toDF("id")
    val edges = (0 until 350).map { _ =>
      (ids(rng.nextInt(ids.length)), ids(rng.nextInt(ids.length)))
    }.filter { case (a, b) => a != b }.toDF("source", "target")
    val local = EdgeSplitter.componentsLocal(spark, nodes, edges)
      .as[(Long, Long)].collect().toSet
    val pregel = EdgeSplitter.components(spark, nodes, edges,
        edgeCountHint = 350, smallCutoff = 0) // force the at-scale path
      .as[(Long, Long)].collect().toSet
    assert(local === pregel, "the two CC plans must compute the same label function")
  }

  test("residual graph keeps every original component connected") {
    val before = cora.numConnectedComponents
    val s = EdgeSplitter.trainTestSplit(cora, 0.1, seed = 42)
    assert(s.residual.numConnectedComponents === before)
  }

  test("negatives are non-edges in either orientation, no self-pairs") {
    val s = EdgeSplitter.trainTestSplit(cora, 0.1, seed = 7)
    val neg = s.examples.filter(col("label") === 0)
    assert(neg.filter(col("source") === col("target")).count() === 0L)
    val both = cora.symmetrizedEdges
      .select(col("id").as("source"), col("nbr").as("target"))
    assert(neg.join(both, Seq("source", "target"), "inner").count() === 0L)
  }

  test("deterministic under seed; different seeds differ") {
    val a = EdgeSplitter.trainTestSplit(cora, 0.05, seed = 11)
      .examples.orderBy("label", "source", "target").collect()
    val b = EdgeSplitter.trainTestSplit(cora, 0.05, seed = 11)
      .examples.orderBy("label", "source", "target").collect()
    val c = EdgeSplitter.trainTestSplit(cora, 0.05, seed = 12)
      .examples.orderBy("label", "source", "target").collect()
    assert(a === b)
    assert(!(a sameElements c))
  }

  test("scale path (forced threshold selection) produces the identical split") {
    val exact = EdgeSplitter.trainTestSplit(cora, 0.1, seed = 42)
    val scale = EdgeSplitter.trainTestSplit(cora, 0.1, seed = 42, exactTopKCutoff = 0L)
    assert(scale.numPositives === exact.numPositives)
    val a = exact.examples.orderBy("label", "source", "target").collect()
    val b = scale.examples.orderBy("label", "source", "target").collect()
    assert(a === b)
    assert(scale.residual.numEdges === exact.residual.numEdges)
    assert(scale.residual.numConnectedComponents === cora.numConnectedComponents)
  }

  test("double split (test off full, train off residual) as the reference applies it") {
    val testS = EdgeSplitter.trainTestSplit(cora, 0.1, seed = 42)
    val trainS = EdgeSplitter.trainTestSplit(testS.residual, 0.1, seed = 43)
    assert(trainS.numPositives === ((2837L - 283L) / 10)) // floor(0.1 * 2554)
    assert(trainS.residual.numEdges === 2554L - 255L)
    // train positives are disjoint from test positives
    val testPos = testS.examples.filter(col("label") === 1)
    val trainPos = trainS.examples.filter(col("label") === 1)
    assert(trainPos.join(testPos, Seq("source", "target"), "inner").count() === 0L)
  }
}
