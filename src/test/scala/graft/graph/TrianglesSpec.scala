package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting must equal brute-force triple
  * enumeration — closed forms on K4 / path / cycle, exact-once
  * generation (no overcount from the wedge join), input
  * canonicalization (duplicates, both directions, self-loops), and a
  * random-graph brute-force equivalence.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] =
    Triangles.perNode(edges.toDF("src", "dst").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ce = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter(p => p._1 != p._2).distinct.toSet
    val nodes = ce.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = for {
      x <- nodes; y <- nodes if y > x && ce((x, y))
      z <- nodes if z > y && ce((x, z)) && ce((y, z))
    } yield (x, y, z)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("K4: every node in 3 triangles; path and even cycle have none") {
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)
    assert(run(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === Map.empty)
  }

  test("canonicalization: duplicates, reversed copies, self-loops don't change counts") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = tri ++ tri.map(_.swap) ++ tri ++ Seq((1L, 1L), (2L, 2L))
    assert(run(noisy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("random graph equals brute force, including heavy-hub degree skew") {
    val rng = new scala.util.Random(13)
    val rand = (0 until 400).map(_ => (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    // add a hub wired to everything — the orientation must keep its
    // wedge contribution bounded and the counts exact
    val hub = (0L until 40L).map(i => (99L, i))
    val edges = rand ++ hub
    assert(run(edges) === brute(edges))
    assert(run(edges, parts = 1) === run(edges, parts = 11)) // deterministic
  }

  test("edgeSupport equals brute force; zero-support edges kept; K4 edges support 2") {
    val rng = new scala.util.Random(31)
    val edges = (0 until 300).map(_ => (rng.nextInt(30).toLong, rng.nextInt(30).toLong)) ++
      Seq((60L, 61L)) // isolated edge: must appear with support 0
    val got = Triangles.edgeSupport(edges.toDF("src", "dst").repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ce = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter(p => p._1 != p._2).distinct.toSet
    val want = ce.map { case (a, b) =>
      val nodes = ce.flatMap(p => Seq(p._1, p._2))
      (a, b) -> nodes.count(c => c != a && c != b &&
        ce((math.min(a, c), math.max(a, c))) &&
        ce((math.min(b, c), math.max(b, c)))).toLong
    }.toMap
    assert(got === want)
    assert(got((60L, 61L)) === 0L)
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)
    Triangles.edgeSupport(k4.toDF("src", "dst")).collect()
      .foreach(r => assert(r.getLong(2) === 2L))
  }

  test("ktruss equals brute-force peeling to fixpoint, k=3 and k=4") {
    def brutePeel(edges: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
      var ce = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
        .filter(p => p._1 != p._2).distinct.toSet
      def sup(s: Set[(Long, Long)]): Map[(Long, Long), Long] = {
        val nodes = s.flatMap(p => Seq(p._1, p._2))
        s.map { case (a, b) => (a, b) -> nodes.count(c => c != a && c != b &&
          s((math.min(a, c), math.max(a, c))) &&
          s((math.min(b, c), math.max(b, c)))).toLong }.toMap
      }
      var stable = false
      var supports = sup(ce)
      while (!stable) {
        val kept = ce.filter(e => supports(e) >= k - 2)
        if (kept == ce) stable = true
        else { ce = kept; supports = sup(ce) }
      }
      supports.filter(_._2 >= k - 2)
    }
    val rng = new scala.util.Random(41)
    // dense-ish random graph + a K5 core so the 4-truss is nonempty and
    // peeling cascades over several rounds
    val edges = (0 until 250).map(_ => (rng.nextInt(25).toLong, rng.nextInt(25).toLong)) ++
      (for (i <- 50L until 55L; j <- (i + 1) until 55L) yield (i, j))
    for (k <- Seq(3, 4)) {
      val got = Triangles.ktruss(edges.toDF("src", "dst").repartition(5), k)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === brutePeel(edges, k), s"k=$k")
    }
    // the K5 core survives k=4 (every edge in 3 triangles within K5)
    val g4 = Triangles.ktruss(edges.toDF("src", "dst"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (for (i <- 50L until 55L; j <- (i + 1) until 55L) yield (i, j))
      .foreach(e => assert(g4.contains(e), s"K5 edge $e peeled"))
  }

  test("localClustering equals the exact rational on a random graph; K4 is 1.0; stars are 0") {
    val rng = new scala.util.Random(29)
    val edges = (0 until 300).map(_ => (rng.nextInt(30).toLong, rng.nextInt(30).toLong)) ++
      (0L until 12L).map(i => (77L, 200L + i)) // star: hub deg 12, leaves deg 1
    val got = Triangles.localClustering(edges.toDF("src", "dst").repartition(5))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val ce = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .filter(p => p._1 != p._2).distinct.toSet
    val degRef = ce.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val triRef = brute(edges.toSeq)
    // every deg >= 2 node present with the exact rational, incl. 0-triangle ones
    degRef.filter(_._2 >= 2).foreach { case (n, d) =>
      val t = triRef.getOrElse(n, 0L)
      val want = BigDecimal(2.0 * t / (d * (d - 1)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.contains(n), s"node $n missing")
      assert(got(n) === ((d, t, want)), s"node $n")
    }
    assert(got.keySet === degRef.filter(_._2 >= 2).keySet)
    // the star's leaves (deg 1) are excluded; the hub has coeff 0
    assert(!got.contains(200L) && got(77L)._3 === 0.0)
    // K4: all coefficients exactly 1
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)
    Triangles.localClustering(k4.toDF("src", "dst")).collect()
      .foreach(r => assert(r.getDouble(3) === 1.0 && r.getLong(1) === 3L))
  }

  test("trussness equals brute-force decomposition; K5/pendant/bridge strata") {
    def bruteTrussness(edges: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
      var ce = edges.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
        .filter(p => p._1 != p._2).distinct.toSet
      def sup(s: Set[(Long, Long)]): Map[(Long, Long), Long] = {
        val nodes = s.flatMap(p => Seq(p._1, p._2))
        s.map { case (a, b) => (a, b) -> nodes.count(c => c != a && c != b &&
          s((math.min(a, c), math.max(a, c))) &&
          s((math.min(b, c), math.max(b, c)))).toLong }.toMap
      }
      val out = scala.collection.mutable.Map.empty[(Long, Long), Long] ++
        ce.map(_ -> 2L)
      var k = 3
      var cur = ce
      while (cur.nonEmpty) {
        var stable = false
        var supports = sup(cur)
        while (!stable) {
          val kept = cur.filter(e => supports(e) >= k - 2)
          if (kept == cur) stable = true
          else { cur = kept; supports = sup(cur) }
        }
        cur.foreach(e => out(e) = k.toLong)
        k += 1
      }
      out.toMap
    }
    // K5 (trussness 5) + a pendant triangle sharing one node (3) + a
    // bridge edge (2) + random noise — strata the fixture graph never
    // reaches, so the multi-level loop is actually exercised
    val k5 = for (i <- 50L until 55L; j <- (i + 1) until 55L) yield (i, j)
    val pendant = Seq((54L, 60L), (54L, 61L), (60L, 61L))
    val bridge = Seq((61L, 99L))
    val rng = new scala.util.Random(17)
    val noise = (0 until 120).map(_ => (rng.nextInt(20).toLong, rng.nextInt(20).toLong))
    val edges = k5 ++ pendant ++ bridge ++ noise
    val got = Triangles.trussness(edges.toDF("src", "dst").repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === bruteTrussness(edges))
    k5.foreach(e => assert(got(e) == 5L, s"K5 edge $e"))
    pendant.foreach(e => assert(got(e) == 3L, s"pendant edge $e"))
    assert(got((61L, 99L)) == 2L, "bridge edge")
  }
}
