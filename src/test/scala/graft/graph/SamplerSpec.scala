package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplerSpec extends SparkSpec {
  import spark.implicits._

  // path 1-2-3-4 plus isolated node 9
  private def path = PropertyGraph(
    Seq(1L, 2L, 3L, 4L, 9L).map(i => (i, Seq(i.toFloat))).toDF("id", "features"),
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("source", "target"))

  test("sampleNeighbors: samples come from the true neighbor set, exactly k, with replacement") {
    val input = Seq((100L, 2L), (101L, 2L)).toDF("example_id", "node")
    val out = NeighborSampler.sampleNeighbors(input, "node", "example_id",
      path.adjacency(), k = 8, level = 1, seed = 42)
      .select("example_id", "samples").as[(Long, Seq[Long])].collect().toMap
    assert(out(100L).length === 8)
    assert(out(100L).toSet.subsetOf(Set(1L, 3L))) // neighbors of 2
    // independence across examples: with 8 draws from 2 options the two
    // example rows almost surely differ under different hash streams
    assert(out(100L) != out(101L) || out(100L).toSet.size == 1)
  }

  test("sampleNeighbors: isolated node pads with -1 sentinel") {
    val input = Seq((1L, 9L)).toDF("example_id", "node")
    val out = NeighborSampler.sampleNeighbors(input, "node", "example_id",
      path.adjacency(), k = 3, level = 1, seed = 1)
      .select("samples").as[Seq[Long]].head()
    assert(out === Seq(-1L, -1L, -1L))
  }

  test("sampleTree2: layer shapes k1 and k1*k2, layer2 children belong to layer1 parents") {
    val input = Seq((7L, 2L)).toDF("example_id", "node")
    val out = NeighborSampler.sampleTree2(input, "node", "example_id",
      path.adjacency(), k1 = 4, k2 = 3, seed = 5)
      .select("layer1", "layer2").as[(Seq[Long], Seq[Long])].head()
    val (l1, l2) = out
    assert(l1.length === 4 && l2.length === 12)
    assert(l1.toSet.subsetOf(Set(1L, 3L)))
    // child block i must be neighbors of parent l1(i)
    val adj = Map(1L -> Set(2L), 2L -> Set(1L, 3L), 3L -> Set(2L, 4L), 4L -> Set(3L))
    l1.zipWithIndex.foreach { case (parent, i) =>
      val block = l2.slice(i * 3, i * 3 + 3).toSet
      assert(block.subsetOf(adj(parent)), s"block $i of parent $parent: $block")
    }
  }

  test("sampleTree2: duplicate (exampleId, node) input rows collapse to ONE correct row") {
    // sampling is a pure function of (exampleId, node), so a duplicated
    // input row adds nothing — before the array_distinct regroup fix it
    // merged both copies' slot structs into a single 2*k1*k2 layer2
    val dup = Seq((7L, 2L), (7L, 2L)).toDF("example_id", "node")
    val single = Seq((7L, 2L)).toDF("example_id", "node")
    def run(in: org.apache.spark.sql.DataFrame) =
      NeighborSampler.sampleTree2(in, "node", "example_id",
        path.adjacency(), k1 = 4, k2 = 3, seed = 5)
        .select("layer1", "layer2").as[(Seq[Long], Seq[Long])].collect().toSeq
    val got = run(dup)
    assert(got.length === 1)
    assert(got.head._1.length === 4 && got.head._2.length === 12)
    assert(got === run(single))
  }

  test("sampleTree2 is deterministic under seed") {
    val input = Seq((7L, 2L), (8L, 3L)).toDF("example_id", "node")
    def run(seed: Long) = NeighborSampler.sampleTree2(input, "node", "example_id",
      path.adjacency(), 4, 3, seed).orderBy("example_id")
      .select("layer1", "layer2").as[(Seq[Long], Seq[Long])].collect().toSeq
    assert(run(5) === run(5))
    assert(run(5) !== run(6))
  }

  test("uniformWalks: walks follow edges, have requested length, stop at isolated starts") {
    val walks = RandomWalk.uniformWalks(path, length = 5, nWalks = 1, seed = 3)
      .select("walk").as[Seq[Long]].collect()
    assert(walks.length === 5)
    val adj = Map(1L -> Set(2L), 2L -> Set(1L, 3L), 3L -> Set(2L, 4L), 4L -> Set(3L))
    walks.filter(_.head != 9L).foreach { w =>
      assert(w.length === 5)
      w.sliding(2).foreach { case Seq(a, b) => assert(adj(a).contains(b), s"$a->$b in $w") }
    }
    assert(walks.find(_.head == 9L).get === Seq(9L)) // isolated start: walk of 1
  }

  test("uniformWalks: nWalks per start, deterministic under seed") {
    val a = RandomWalk.uniformWalks(path, 4, 3, seed = 11)
      .orderBy("walk_id").select("walk").as[Seq[Long]].collect().toSeq
    val b = RandomWalk.uniformWalks(path, 4, 3, seed = 11)
      .orderBy("walk_id").select("walk").as[Seq[Long]].collect().toSeq
    assert(a.length === 15)
    assert(a === b)
  }

  test("negative sampling follows the degree^0.75 distribution (hub oversampled)") {
    // star: hub 0 has degree 10, leaves degree 1 → hub weight 10^.75≈5.6
    // of total ≈15.6 → hub ≈36% of table rows; uniform would give 1/11
    val star = PropertyGraph(
      (0L to 10L).map(i => (i, Seq(i.toFloat))).toDF("id", "features"),
      (1L to 10L).map(i => (0L, i)).toDF("source", "target"))
    val table = RandomWalk.negativeTable(star, 0.75)
    val counts = table.groupBy("context").count()
      .as[(Long, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    val hubShare = counts(0L) / total
    assert(hubShare > 0.25 && hubShare < 0.45, s"hub share $hubShare")
    // leaves all present with equal copies
    (1L to 10L).foreach(i => assert(counts.contains(i)))
    // isolated nodes never sampled under smoothing
    val withIsolated = PropertyGraph(
      (0L to 11L).map(i => (i, Seq(i.toFloat))).toDF("id", "features"),
      (1L to 10L).map(i => (0L, i)).toDF("source", "target"))
    assert(!RandomWalk.negativeTable(withIsolated, 0.75)
      .filter(col("context") === 11L).head(1).nonEmpty)
  }

  test("unsupervisedPairs: pos from walks, |neg| = |pos|, labels 1/0") {
    val pairs = RandomWalk.unsupervisedPairs(path, length = 3, nWalks = 2, seed = 21)
    val pos = pairs.filter(col("label") === 1)
    val neg = pairs.filter(col("label") === 0)
    assert(pos.count() === neg.count())
    // positive contexts really co-occur: all within 2 hops on the path
    // graph (walks may return to the start, so self is reachable)
    val within2 = Map(
      1L -> Set(2L, 3L, 1L), 2L -> Set(1L, 3L, 4L, 2L),
      3L -> Set(1L, 2L, 4L, 3L), 4L -> Set(2L, 3L, 4L))
    pos.select("target", "context").as[(Long, Long)].collect().foreach {
      case (t, c) => assert(within2(t).contains(c), s"pair $t-$c")
    }
  }
}
