package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** G3 — EdgeSplitter.train_test_split parity
  * (models/supervised.py:67-77: `method="global", keep_connected=True`,
  * applied twice — test split p=0.1 off the full graph, then train split
  * p=0.1 off the residual).
  *
  * Semantics reproduced:
  *  - sample exactly `floor(p·|E|)` positive edges, uniformly (seeded),
  *    such that removing them keeps every connected component of the
  *    original graph connected;
  *  - generate the same number of negative examples: uniformly sampled
  *    node pairs that are NOT edges (either orientation) and not
  *    self-pairs;
  *  - return the reduced graph + labeled examples.
  *
  * Algorithm (sample-and-repair, fully distributed):
  *  1. rank edges by a seeded hash (deterministic under any partitioning);
  *  2. take the top `k` unbanned edges as a trial set;
  *  3. run GraphX connectedComponents on the residual (edges minus
  *     accepted minus trial); trial edges whose endpoints land in
  *     different components would disconnect → ban them, keep the rest;
  *  4. repeat until `k` positives are accepted (≤ `maxRounds` CC jobs —
  *     in practice 1-3 for p≈0.1).
  *
  * Scale notes: each round is one CC job (log-diameter Pregel) plus an
  * exact smallest-k selection on the hash rank via `TopK.smallestBy` —
  * plain orderBy+limit below the cutoff, approx-quantile threshold +
  * distributed trim above it, so a billion-edge split never funnels
  * through the driver. Negative sampling is ring-pairing over a
  * zipWithIndex'd node list + anti-join against the edge set — no
  * driver-side materialization, no rejection loop over collect.
  */
object EdgeSplitter {

  /** `examples` columns: source LONG, target LONG, label INT (1 pos / 0 neg). */
  final case class EdgeSplit(residual: PropertyGraph, examples: DataFrame,
                             numPositives: Long)

  /** @param exactTopKCutoff rank-selection sizes at or below this use
    *   the exact orderBy+limit plan; larger ones take the distributed
    *   threshold path (TopK.smallestBy). Tests force 0 to exercise the
    *   scale path on fixtures; both paths are exact and identical.
    */
  def trainTestSplit(g: PropertyGraph, p: Double, seed: Long,
                     maxRounds: Int = 8,
                     exactTopKCutoff: Long = 1L << 20): EdgeSplit = {
    val spark = g.nodes.sparkSession
    val total = g.numEdges
    val k = (p * total).toLong
    require(k > 0, s"p=$p of $total edges yields an empty split")

    // Stable per-row identity: parallel (s,t) edges get a duplicate
    // index via a keyed window — deterministic, unlike
    // monotonically_increasing_id. Rank = seeded hash of the identity.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "target").orderBy("source")
    val ranked = g.edges
      .withColumn("__dup", row_number().over(w))
      .withColumn("__r", xxhash64(lit(seed), col("source"), col("target"), col("__dup")))
      .cache()

    var accepted = spark.emptyDataFrame
    var acceptedCount = 0L
    var banned = spark.emptyDataFrame
    var haveAccepted = false
    var haveBanned = false
    var rounds = 0

    while (acceptedCount < k && rounds < maxRounds) {
      rounds += 1
      val unbanned =
        if (haveBanned) ranked.join(banned, Seq("source", "target", "__dup"), "left_anti")
        else ranked
      val pool =
        if (haveAccepted) unbanned.join(accepted, Seq("source", "target", "__dup"), "left_anti")
        else unbanned
      val trial = graft.operators.TopK.smallestBy(pool, "__r",
        Seq("source", "target", "__dup"), k - acceptedCount, exactTopKCutoff).cache()
      if (trial.isEmpty) {
        rounds = maxRounds // no candidates left; stop
      } else {
        val removed = if (haveAccepted) accepted.unionByName(trial) else trial
        val residualEdges = ranked.join(removed, Seq("source", "target", "__dup"), "left_anti")
        // |residual| ≤ |E|, already counted — skip a count job
        val comp = components(spark, g.nodeIds, residualEdges, edgeCountHint = total)
        val judged = trial
          .join(comp.withColumnRenamed("id", "source").withColumnRenamed("component", "__cs"), Seq("source"))
          .join(comp.withColumnRenamed("id", "target").withColumnRenamed("component", "__ct"), Seq("target"))
        // localCheckpoint (not cache): each piece's lineage nests
        // trial → pool → accepted → previous rounds; a cache keeps the
        // nested ANALYZED plan alive (round-3 verdict: 127M-char plan
        // strings), a checkpoint flattens each piece to a scan. The
        // accumulators `accepted`/`banned` are then ALSO checkpointed
        // per round — a union-of-scans still grows O(rounds²) nodes
        // across a double split (round-4: 176 KB plan strings tripping
        // the 100 KB cap), while re-materializing ≤ k rows of 4 longs
        // per round is noise next to the round's CC job.
        val safe = judged.filter(col("__cs") === col("__ct"))
          .select("source", "target", "__dup", "__r").localCheckpoint()
        val bridge = judged.filter(col("__cs") =!= col("__ct"))
          .select("source", "target", "__dup").localCheckpoint()
        val nSafe = safe.count()
        accepted = (if (haveAccepted) accepted.unionByName(safe) else safe)
          .localCheckpoint()
        haveAccepted = true
        acceptedCount += nSafe
        if (bridge.head(1).nonEmpty) {
          banned = (if (haveBanned) banned.unionByName(bridge) else bridge)
            .localCheckpoint()
          haveBanned = true
        }
        trial.unpersist()
      }
    }

    // The documented contract is EXACTLY ⌊p·|E|⌋ positives; a
    // bridge-heavy graph (star/tree: every edge disconnects) or an
    // exhausted round budget can strand the loop short — surface that
    // LOUDLY (the reference splitter raises here too) instead of
    // returning a silently smaller, possibly EMPTY, example set that
    // trains an untrained model downstream.
    if (acceptedCount < k)
      throw new IllegalStateException(
        s"EdgeSplitter: only $acceptedCount of $k requested positive edges " +
          s"could be removed without disconnecting components after $rounds " +
          s"round(s); the graph is too bridge-heavy for p=$p (lower p or " +
          "raise maxRounds)")
    val pos = accepted.select(col("source"), col("target"), col("__dup"))
    // The split is an iterative product (anti-joins + CC per round): cut
    // the lineage here, like Pregel's periodic checkpointing, so
    // downstream consumers (double-split, training) start from a flat
    // plan instead of re-deriving the whole iteration. Edges are 2 longs
    // a row — cheap to materialize even at large |E|.
    val residualEdges = ranked.join(pos, Seq("source", "target", "__dup"), "left_anti")
      .select("source", "target")
      .localCheckpoint()
    val posExamples = accepted.select(col("source"), col("target"), lit(1).as("label"))
    val negExamples = sampleNegatives(g, acceptedCount, seed, exactTopKCutoff)
    val examples = posExamples.unionByName(negExamples).localCheckpoint()
    ranked.unpersist()
    EdgeSplit(PropertyGraph(g.nodes, residualEdges), examples, acceptedCount)
  }

  /** Uniform non-edge pairs, |result| = n, deterministic under seed.
    * Ring pairing: index nodes 0..N-1 (sorted by id, distributed
    * zipWithIndex), then for pseudorandom offsets o_j pair idx with
    * (idx+o_j) mod N — each offset yields N candidate self-free pairs;
    * anti-join the (symmetrized) edge set, rank by hash, take n.
    */
  private[graph] def sampleNegatives(g: PropertyGraph, n: Long, seed: Long,
                                     exactTopKCutoff: Long = 1L << 20): DataFrame = {
    val spark = g.nodes.sparkSession
    import spark.implicits._
    val idx = g.nodeIds.orderBy("id").as[Long].rdd
      .zipWithIndex().toDF("id", "idx").cache()
    val count = idx.count()
    require(count >= 2, "need at least 2 nodes for negative sampling")
    // enough offsets that n negatives survive the anti-join whp
    val nOffsets = math.min(math.max(2L, (2L * n) / count + 2L), count - 1).toInt
    val edgesBoth = g.symmetrizedEdges
      .select(col("id").as("source"), col("nbr").as("target"))

    // one ranked candidate pool from `nOff` seeded ring offsets; the
    // offset stream is a fixed iterator from `seed`, so a WIDER take
    // yields a SUPERSET of candidates (retry below stays deterministic)
    def attempt(nOff: Int): DataFrame = {
      val rng = new scala.util.Random(seed)
      val offsets = Iterator.continually(1L + rng.nextLong().abs % (count - 1))
        .distinct.take(nOff).toSeq
      val shifted = offsets.map { o =>
        idx.select(col("id").as("source"),
          pmod(col("idx") + lit(o), lit(count)).as("__pidx"))
          .join(idx.withColumnRenamed("idx", "__pidx").withColumnRenamed("id", "target"), Seq("__pidx"))
          .select("source", "target")
      }.reduce(_ unionByName _)
      val pool = shifted
        .filter(col("source") =!= col("target"))
        .join(edgesBoth, Seq("source", "target"), "left_anti")
        .dropDuplicates("source", "target")
        .withColumn("__nr", xxhash64(lit(seed + 1), col("source"), col("target")))
      graft.operators.TopK.smallestBy(pool, "__nr", Seq("source", "target"),
          n, exactTopKCutoff)
        .select(col("source"), col("target"), lit(0).as("label"))
        // materialize (≤ n rows of 2 longs) so the shortfall check and
        // every downstream consumer reuse one execution
        .localCheckpoint()
    }

    // exactly n label-0 rows or fail loudly — a too-small surviving
    // pool otherwise ships CLASS-IMBALANCED examples and silently
    // skews BCE training. An unlucky draw (offsets landing on real
    // edges) gets ONE deterministic 8× retry before the dense-graph
    // verdict.
    var negs = attempt(nOffsets)
    if (negs.count() < n && nOffsets < count - 1)
      negs = attempt(math.min(8L * nOffsets, count - 1).toInt)
    idx.unpersist()
    val got = negs.count()
    if (got < n)
      throw new IllegalStateException(
        s"EdgeSplitter: only $got of $n requested negative (non-edge) pairs " +
          "survive the edge anti-join; the graph is too dense for this " +
          "split size")
    negs
  }

  /** Connected components of (nodeIds, edges) → DataFrame(id, component).
    * Component label = min vertex id in the component (GraphX CC
    * contract) — deterministic.
    *
    * Size-gated plan choice (the broadcast-join trick applied to CC):
    * below `smallCutoff` edges the labels come from a driver-side
    * union-find over the collected edge list — the label function is
    * identical (min id per component; ComponentsSpec asserts bitwise
    * agreement with the Pregel path), but one collect replaces the
    * ~10-iteration Pregel job cascade that dominates a fixture-scale
    * split's wall-clock. At scale the GraphX path runs unchanged.
    * `edgeCountHint` lets callers who already know |E| skip the count.
    */
  private[graph] def components(spark: SparkSession, nodeIds: DataFrame,
                                edges: DataFrame,
                                edgeCountHint: Long = -1L,
                                smallCutoff: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    val eCount = if (edgeCountHint >= 0) edgeCountHint else edges.count()
    if (eCount <= smallCutoff) return componentsLocal(spark, nodeIds, edges)
    val vRDD = nodeIds.select(col("id").cast(LongType)).as[Long].rdd.map(id => (id: VertexId, ()))
    val eRDD = edges.select(col("source"), col("target")).as[(Long, Long)]
      .rdd.map { case (s, t) => Edge(s, t, ()) }
    val graph = Graph(vRDD, eRDD, (),
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    val cc = graph.connectedComponents().vertices
      .map { case (id, comp) => (id, comp) }.toDF("id", "component")
    cc
  }

  /** The fixture-scale path: union-find on the driver, min-id labels —
    * the exact function the GraphX path computes.
    */
  private[graph] def componentsLocal(spark: SparkSession, nodeIds: DataFrame,
                                     edges: DataFrame): DataFrame = {
    import spark.implicits._
    val ids = nodeIds.select(col("id").cast(LongType)).as[Long].collect()
    val es = edges.select(col("source").cast(LongType), col("target").cast(LongType))
      .as[(Long, Long)].collect()
    // intern node ids; edge endpoints missing from the node list are
    // added like GraphX adds default-attr vertices (same contract)
    // boxed key/value types: a java.util.HashMap[Long, Int] would unbox
    // get()'s null miss to 0 and silently intern nothing
    val idIndex = new java.util.HashMap[java.lang.Long, Integer](ids.length * 2)
    val allIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    def intern(id: Long): Int = {
      val e = idIndex.get(id)
      if (e != null) e.intValue
      else {
        idIndex.put(id, Integer.valueOf(allIds.length))
        allIds += id
        allIds.length - 1
      }
    }
    ids.foreach(intern(_): Unit)
    val pairs = es.map { case (s, t) => (intern(s), intern(t)) }
    val n = allIds.length
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min node ID per root (root index order ≠ id order in general)
    val minId = new Array[Long](n)
    java.util.Arrays.fill(minId, Long.MaxValue)
    var i = 0
    while (i < n) {
      val r = find(i)
      if (allIds(i) < minId(r)) minId(r) = allIds(i)
      i += 1
    }
    val out = new Array[(Long, Long)](n)
    i = 0
    while (i < n) { out(i) = (allIds(i), minId(find(i))); i += 1 }
    out.toSeq.toDF("id", "component")
  }
}
