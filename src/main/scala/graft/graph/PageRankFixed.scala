package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic fixed-point PageRank over a string-keyed edge list.
  *
  * Training-data pipelines use PageRank-family centrality as a
  * document/domain quality prior (the Common Crawl curation pattern:
  * rank the link graph, weight or gate sources by centrality). The
  * float version of that job is only approximately reproducible — sum
  * order and damping multiplies drift across partitionings and engines.
  * This variant runs the whole recurrence in SCALED-INTEGER arithmetic
  * (ranks are mass × 10^18, every divide is an integer floor divide,
  * every sum is exact), so a fixed iteration count yields bit-identical
  * ranks on any partitioning, any cluster size, and any engine — the
  * q58/q101 no-transcendental discipline pushed one step further to a
  * no-rounding discipline. Floor losses only ever DROP mass (≤ 1 unit
  * of 10^-18 per divide), so totals stay bounded by SCALE and the
  * result is a deterministic lower envelope of the real-valued ranks
  * with per-node error ≤ iters × (1 + 17/20 × indegree) × 10^-18.
  *
  * Scale shape (the textbook distributed PageRank layout): the edge
  * list is hash-partitioned by `src` ONCE — with the 1/outdeg weight
  * attached in the same pass by a src-keyed window, so iterations need
  * no separate weight join — and cached. The layout deliberately uses
  * `persist`, not `localCheckpoint`: under AQE a checkpoint's
  * LogicalRDD forgets its partitioning (the adaptive root's
  * pre-execution partitioning is unknown until executed), while a
  * MATERIALIZED InMemoryRelation carries it, so each iteration's
  * src-join plans zero edge-side exchanges (PlanShapeSpec pins this;
  * it depends on canChangeCachedPlanOutputPartitioning=false in the
  * session). Per iteration only the node-sized rank table moves: one
  * exchange (or a broadcast, when the optimizer sees it is small) to
  * co-locate it with the edges, one map-side-combined exchange of
  * per-dst partial sums. Nothing edge-sized ever shuffles after
  * layout; the driver holds exactly one scalar (the node count).
  * Intermediate iterations are snapped with `localCheckpoint` (rank
  * partitioning is NOT worth preserving — ranks move by design), so
  * lineage stays flat for any iteration count; the final iteration is
  * returned as a live plan, so `explain`/PlanAudit see one true
  * iteration's shape.
  *
  * Contract: `edges(src STRING, dst STRING)` distinct. Under the
  * default `dangling = "reject"` every node must appear as a src at
  * least once (no dangling mass — callers with sink nodes symmetrize
  * or self-loop first); dangling dsts are rejected because their mass
  * would silently leak. `dangling = "redistribute"` lifts the
  * contract for real crawl graphs (sinks are the norm): the node set
  * becomes srcs ∪ dsts, and each iteration the sinks' aggregate rank
  * D re-enters damped through the teleport profile — every node gains
  * ⌊17·D / (20·n)⌋ (classic) or seeds gain ⌊17·D / (20·|S|)⌋
  * (personalized), the standard dangling-mass treatment. D is one
  * node-sized semi-join sum per iteration, collected as a single
  * driver scalar and folded back EXACTLY via BigInt floor division —
  * the no-rounding discipline is preserved, so redistribute runs are
  * as bit-reproducible as reject runs (and identical to them on a
  * sink-free graph, where D = 0; PageRankFixedSpec pins both, plus
  * mass conservation on a sink-bearing graph).
  */
object PageRankFixed {

  /** Rank unit: 1.0 of probability mass == 10^18 (fits in a BIGINT). */
  val Scale: Long = 1000000000000000000L

  /** `iters` damped iterations (d = 17/20 = 0.85 exactly) from the
    * uniform start; returns `(node STRING, rank_scaled BIGINT)`.
    */
  def run(edges: DataFrame, iters: Int, dangling: String = "reject"): DataFrame =
    personalized(edges, iters, None, dangling)

  /** Personalized PageRank: the teleport vector is uniform over the
    * seed set instead of all nodes — the seed-and-expand curation
    * pattern (rank everything by proximity to a trusted seed list,
    * admit the high-PPR tail). `seeds` is a single `node` column and
    * must be a subset of the graph's nodes (teleporting to a non-node
    * would silently vanish mass — rejected loudly). Same scaled-
    * integer discipline as `run`: seeds get base (1−d)/|S| and start
    * at 1/|S|, non-seeds at 0 — bit-identical on any partitioning.
    */
  def personalized(edges: DataFrame, iters: Int,
                   seeds: Option[DataFrame],
                   dangling: String = "reject"): DataFrame = {
    require(iters >= 1, "PageRankFixed.run: iters must be >= 1")
    require(dangling == "reject" || dangling == "redistribute",
      s"PageRankFixed: dangling must be 'reject' or 'redistribute', got '$dangling'")
    val redistribute = dangling == "redistribute"
    // Edge layout: partition by src, attach the scaled 1/outdeg weight
    // via a window over that same partitioning (zero extra exchanges,
    // and no per-iteration weight join), cache. CacheManager keys on
    // the canonicalized plan, so repeated runs over the same input
    // reuse one entry rather than leaking.
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .withColumn("__outdeg",
        count(lit(1)).over(Window.partitionBy(col("src"))))
      .withColumn("__w", expr(s"${Scale}L div __outdeg"))
      .drop("__outdeg")
      .persist()
    // Materialize the edge cache FIRST: every later table (nodes,
    // sinks, profile) derives from it, so the caller's edge subtree —
    // often a corpus scan + distinct + union — is evaluated exactly
    // once. (The first cut built `nodes` from the raw input and
    // counted it before e, re-running that subtree a second time for
    // the edge-cache materialization — measured as the bulk of
    // q104/q108's layout cost at sf0.1.) Materializing before the
    // iteration plans are built is also what makes the cached
    // partitioning visible to EnsureRequirements.
    e.count()
    // Node list from the CACHED edge layout; node-keyed for the
    // per-iteration left join. Redistribute mode admits sinks, so its
    // node set includes dsts.
    val nodes = (if (redistribute)
        e.select(col("src").as("node"))
          .unionByName(e.select(col("dst").as("node")))
      else e.select(col("src").as("node")))
      .distinct().persist()
    val n = nodes.count()
    require(n > 0, "PageRankFixed.run: empty graph")
    // The static sink set (nodes with no out-edges — under 'reject'
    // the node set is the srcs, so this is exactly the dangling-dst
    // probe). Reject fails loudly; redistribute persists the set for
    // the per-iteration mass sweep.
    val sinks = (if (redistribute)
        nodes.join(e.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
      else e.select(col("dst").as("node"))
        .join(nodes, Seq("node"), "left_anti").limit(1))
      .persist()
    val nSinks = sinks.count()
    require(redistribute || nSinks == 0L,
      "PageRankFixed.run: found dst nodes with no out-edges (dangling); " +
        "symmetrize or self-loop them first, or pass dangling = 'redistribute'")
    // Teleport profile per node: (__base, __r0) — uniform over all
    // nodes (classic) or over the seed set (personalized). Both use
    // (1 − d)/k = 3·SCALE div (20k), exact in a driver Long (3e18 < 2^63).
    val (profiled, teleportCount) = seeds match {
      case None =>
        (nodes.withColumn("__base", lit(3L * Scale / (20L * n)))
          .withColumn("__r0", lit(Scale / n)), n)
      case Some(sd) =>
        val s = sd.select(col("node")).distinct().persist()
        val k = s.count()
        require(k > 0, "PageRankFixed.personalized: empty seed set")
        val offGraph = s.join(nodes, Seq("node"), "left_anti").limit(1).count()
        require(offGraph == 0L,
          "PageRankFixed.personalized: seed nodes missing from the graph " +
            "(teleport mass would vanish silently)")
        (nodes.join(s.withColumn("__seed", lit(1)), Seq("node"), "left")
          .withColumn("__base",
            when(col("__seed") === 1, lit(3L * Scale / (20L * k)))
              .otherwise(lit(0L)))
          .withColumn("__r0",
            when(col("__seed") === 1, lit(Scale / k)).otherwise(lit(0L)))
          .drop("__seed"), k)
    }
    val prof = profiled.persist()
    prof.count() // materialize node-keyed before the iteration plans
    var r = prof.select(col("node"), col("__r0").as("rank_scaled"))
    for (i <- 1 to iters) {
      // Per-edge contribution r(src)·w(src) needs 10^36 headroom →
      // one DECIMAL(38,0) product, floored back to a BIGINT unit
      // before the exact per-dst sum.
      val contrib = e
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr(
          s"(CAST(rank_scaled AS DECIMAL(38,0)) * __w) div ${Scale}L"
        ).as("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__msum"))
      // Dangling-mass sweep (redistribute mode): sinks' aggregate rank
      // D re-enters damped through the teleport profile. One node-
      // sized semi-join sum → a single driver scalar, folded back via
      // exact BigInt floor division (17·D can exceed Long range).
      val bonus = if (redistribute && nSinks > 0) {
        val d = r.join(sinks, Seq("node"), "left_semi")
          .agg(coalesce(sum(col("rank_scaled")), lit(0L))).first().getLong(0)
        (BigInt(17) * d / (BigInt(20) * teleportCount)).toLong
      } else 0L
      // r' = __base + d·Σ + bonus·[teleport target], with d·Σ = 17·Σ
      // div 20 (17e18 needs the decimal detour too). Left join keeps
      // zero-indegree nodes alive. The bonus lands where __base does:
      // every node (classic) or exactly the seeds (personalized,
      // where __base > 0 ⇔ seed).
      val bonusCol = if (seeds.isEmpty) lit(bonus)
        else when(col("__base") > 0L, lit(bonus)).otherwise(lit(0L))
      val next = prof
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), (expr(
          "__base + (CAST(17 AS DECIMAL(38,0)) * COALESCE(__msum, 0L)) div 20"
        ) + bonusCol).as("rank_scaled"))
      // Snap every NON-final iteration flat; return the last one live.
      // LAZY checkpoints: the plan built on top is a LogicalRDD either
      // way (lineage stays flat for any iteration count), but an eager
      // snap runs one JOB per iteration — at local/bench scale the
      // per-job fixed cost dominated the whole recurrence. Lazily, the
      // caller's single action computes the chain inline, storing each
      // iteration's blocks as it passes (redistribute mode still
      // materializes per iteration via the dangling-mass action — same
      // behavior, one name).
      r = if (i < iters) next.localCheckpoint(eager = false) else next
    }
    r
  }
}
