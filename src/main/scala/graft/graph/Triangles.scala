package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by DEGREE-ORDERED ORIENTATION — the
  * canonical MapReduce/Spark layout (Suri & Vassilvitskii's "last
  * reducer" construction): orient every undirected edge from its
  * lower-(degree, node) endpoint to the higher one, form wedges only
  * at each node's oriented OUT-neighbors, and close them against the
  * oriented edge set. Every triangle is generated exactly once (its
  * three nodes have a unique (deg, node)-order, and the wedge forms
  * only at the smallest), so no post-hoc dedup pass exists.
  *
  * Why this survives a 100× scale-up: the naive wedge join explodes
  * at hubs (a degree-d node contributes d² wedges); orientation caps
  * every node's out-degree at O(√E) (a node with out-degree t has t
  * out-neighbors of degree ≥ its own, so t(t+1)/2 ≤ E), which bounds
  * wedges by O(E^1.5) — the theoretical optimum for exact triangle
  * enumeration — independent of the degree distribution. All four
  * shuffles are keyed (two node-keyed degree joins, the wedge join on
  * the apex, the closure join on the (v, w) edge key); nothing is
  * ever all-pairs, nothing collects.
  *
  * Input: an edge list in any mix of directions/duplicates;
  * canonicalized here to distinct undirected (a < b) pairs with
  * self-loops dropped. Output: `(node, n_triangles)` for every node
  * in at least one triangle — exact counts, engine-recomputable (the
  * oracle brute-forces the triple join on the same canonical edges).
  */
object Triangles {

  /** Distinct undirected (a < b) edges, self-loops dropped. */
  private def canonical(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Exact undirected degree per node of the canonical edge set. */
  private def degrees(ce: DataFrame): DataFrame =
    ce.select(col("a").as("node"))
      .unionAll(ce.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  def perNode(edges: DataFrame, srcCol: String = "src",
              dstCol: String = "dst"): DataFrame =
    perNodeOf(canonical(edges, srcCol, dstCol))

  private def perNodeOf(ce: DataFrame): DataFrame =
    enumerate(ce)
      .select(explode(array(col("t_u"), col("t_v"), col("t_w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))

  /** Every triangle exactly once as (t_u, t_v, t_w) — the oriented
    * wedge-and-close core shared by [[perNode]], [[localClustering]]
    * and [[edgeSupport]]. Input must be canonical (a < b, distinct).
    */
  private def enumerate(ce: DataFrame): DataFrame = {
    val deg = degrees(ce)
    // orient by the (deg, node) total order: u → v iff u's key is lower
    val oriented = ce
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), Seq("b"))
      .select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"),
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("__da").as("du"), col("__db").as("dv")))
          .otherwise(struct(col("__db").as("du"), col("__da").as("dv"))).as("d"))
      .select(col("e.u").as("u"), col("e.v").as("v"),
        col("d.du").as("du"), col("d.dv").as("dv"))
      .localCheckpoint() // one oriented edge set feeds wedge + closure
    // wedges at the apex u: out-neighbor pair (v, w) with v ≺ w in the
    // same (deg, node) order, so the candidate arrives pre-oriented
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        (col("e1.dv") < col("e2.dv") ||
          (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("t_u"), col("e1.v").as("t_v"), col("e2.v").as("t_w"))
    // closure: the (v, w) oriented edge must exist
    wedges.join(oriented.select(col("u").as("t_v"), col("v").as("t_w")),
      Seq("t_v", "t_w"), "left_semi")
  }

  /** LOCAL CLUSTERING COEFFICIENT: triangles(v) / (deg(v) choose 2)
    * for every node with degree ≥ 2 — exactly one keyed join of the
    * per-node triangle counts (the O(E^1.5) orientation above)
    * against the exact degree table, so it inherits [[perNode]]'s
    * scale shape wholesale; the only new arithmetic is one double
    * division rounded to 9 on exact integer inputs, making the result
    * engine-recomputable (Watts & Strogatz 1998's C_v).
    * Output: `(node, deg, n_triangles, coeff)`; triangle-free nodes
    * appear with 0 — the left join keeps them, because "this hub has
    * coefficient 0" is exactly what a community audit wants to see.
    */
  def localClustering(edges: DataFrame, srcCol: String = "src",
                      dstCol: String = "dst"): DataFrame = {
    // ONE canonical edge set shared by the degree table and the
    // triangle core — the two sides then reference IDENTICAL
    // canonicalize/degree subtrees, so ReuseExchange collapses their
    // shuffles (the old form re-derived both from the raw edges inside
    // perNode, doubling the pre-enumeration work)
    val ce = canonical(edges, srcCol, dstCol)
    val deg = degrees(ce)
    deg.filter(col("deg") >= 2)
      .join(perNodeOf(ce), Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("coeff", round(
        (col("n_triangles") * lit(2.0)) / (col("deg") * (col("deg") - 1)), 9))
      .select(col("node"), col("deg"), col("n_triangles"), col("coeff"))
  }

  /** EDGE TRIANGLE SUPPORT — the k-truss building block (Cohen 2008):
    * for every canonical edge, the number of triangles it closes. A
    * triangle's three nodes come out of [[enumerate]] oriented by the
    * (deg, node) order, so each of its three edges is re-canonicalized
    * by value before the count; zero-support edges are kept by the
    * left join (a truss peel needs to see them). Inherits the
    * O(E^1.5) enumeration shape; the only additions are one explode
    * (3 skinny rows per triangle) and one edge-keyed aggregate + join.
    * Output: (a, b, support), a < b, one row per canonical edge.
    */
  def edgeSupport(edges: DataFrame, srcCol: String = "src",
                  dstCol: String = "dst"): DataFrame =
    supportOf(canonical(edges, srcCol, dstCol))

  private def supportOf(ce: DataFrame): DataFrame =
    ce.join(positiveSupportOf(ce), Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("support"), lit(0L)).as("support"))

  /** Support counts for edges in ≥ 1 triangle ONLY — every (a, b) here
    * is an edge of `ce` by the closure join, so [[supportOf]]'s left
    * join exists solely to re-attach support-0 edges. The peel loop
    * filters on support ≥ k − 2 ≥ 1, which drops those rows anyway, so
    * it reads THIS table directly and skips the re-attach join (one
    * less (a, b)-keyed exchange of the full edge set per round, r19).
    */
  private def positiveSupportOf(ce: DataFrame): DataFrame =
    enumerate(ce)
      .select(explode(array(
        struct(least(col("t_u"), col("t_v")).as("a"),
          greatest(col("t_u"), col("t_v")).as("b")),
        struct(least(col("t_u"), col("t_w")).as("a"),
          greatest(col("t_u"), col("t_w")).as("b")),
        struct(least(col("t_v"), col("t_w")).as("a"),
          greatest(col("t_v"), col("t_w")).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))

  /** K-TRUSS by support peeling (Cohen 2008): repeatedly recompute
    * edge support on the surviving edge set and drop every edge in
    * fewer than k − 2 triangles, until a fixpoint (or `maxRounds`).
    * Each round is one [[supportOf]] pass — the O(E^1.5) enumeration
    * on a shrinking edge set — with the survivors localCheckpointed
    * so lineage stays flat across rounds (the PageRankFixed loop
    * discipline). Peeling is determined purely by counts, so the
    * result is partitioning-deterministic; with enough rounds it is
    * THE k-truss (each round either strictly shrinks the edge set or
    * stops — TrianglesSpec pins the fixpoint against brute-force
    * peeling). Per-round convergence is checked with one count()
    * job; rounds are few in practice (support can only drop).
    * Output: the surviving (a, b, support) edges, support ≥ k − 2.
    */
  def ktruss(edges: DataFrame, k: Int, maxRounds: Int = 20,
             srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(maxRounds >= 1)
    peelFrom(canonical(edges, srcCol, dstCol).localCheckpoint(), k, maxRounds)
  }

  /** The support-peel loop on an ALREADY-canonical, materialized edge
    * set — shared by [[ktruss]] and [[trussness]] (whose level k + 1
    * starts from level k's survivors, never re-canonicalizing).
    * Returns the surviving (a, b, support) edges, support ≥ k − 2.
    */
  private def peelFrom(ce: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    // Each round materializes the FILTERED support table (with the
    // support column) instead of a bare (a, b) projection: the
    // convergence count reads the checkpoint, and the fixpoint return
    // IS the checkpoint — the old shape re-ran the whole enumeration
    // once more when the returned `supported.filter` was consumed
    // (one full O(E^1.5) pass saved per peel level, r19). Reading
    // positiveSupportOf directly is equivalent here: support-0 edges
    // fail `support >= k - 2 >= 1` either way.
    var cur = ce
    var n = cur.count()
    var round = 0
    var supported = positiveSupportOf(cur)
      .filter(col("support") >= k - 2).localCheckpoint()
    while (round < maxRounds && n > 0) {
      val m = supported.count()
      if (m == n) return supported
      cur = supported.select(col("a"), col("b"))
      n = m; round += 1
      supported = positiveSupportOf(cur)
        .filter(col("support") >= k - 2).localCheckpoint()
    }
    supported
  }

  /** TRUSS DECOMPOSITION — every canonical edge's maximum trussness:
    * the largest k such that the edge survives the k-truss peel
    * (Cohen 2008; trussness 2 = the trivial truss every edge belongs
    * to). Levels nest ((k+1)-truss ⊆ k-truss), so level k + 1 peels
    * FROM level k's survivors — each level is the [[ktruss]] loop on a
    * monotonically shrinking, localCheckpointed edge set, and the
    * whole decomposition stops at the first empty level (no fixed k
    * list; `maxK` is a runaway bound, not a tuning knob). An edge's
    * trussness is the last level that kept it: one max over the level
    * tags, one left join back onto the canonical set. Inherits the
    * O(E^1.5) oriented enumeration per round; total rounds are bounded
    * by the graph's truss depth, which is small on real graphs.
    * Output: (a, b, trussness ≥ 2), one row per canonical edge.
    */
  def trussness(edges: DataFrame, maxRoundsPerK: Int = 20, maxK: Int = 64,
                srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val ce = canonical(edges, srcCol, dstCol).localCheckpoint()
    var cur = ce
    var n = cur.count()
    var k = 3
    var levels = Vector.empty[DataFrame]
    while (n > 0 && k <= maxK) {
      // peelFrom returns a checkpointed table — the bare projection
      // needs no second materialization (r19)
      val kept = peelFrom(cur, k, maxRoundsPerK)
        .select(col("a"), col("b"))
      val m = kept.count()
      if (m > 0) levels :+= kept.withColumn("__k", lit(k.toLong))
      cur = kept; n = m; k += 1
    }
    if (levels.isEmpty)
      ce.select(col("a"), col("b"), lit(2L).as("trussness"))
    else {
      val best = levels.reduce(_ unionByName _)
        .groupBy(col("a"), col("b")).agg(max(col("__k")).as("__mk"))
      ce.join(best, Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          coalesce(col("__mk"), lit(2L)).as("trussness"))
    }
  }
}
