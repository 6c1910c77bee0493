package graft

/** Regression net for physical-plan SHAPES: the no-join headline
  * queries' exchange counts are pinned to PLANS.md's audit rows, so a
  * code change (or Spark upgrade) that silently adds a shuffle fails a
  * test instead of surfacing as a bench regression three rounds later.
  * Join queries are excluded on purpose — their exchange counts
  * legitimately change with AQE's broadcast decisions per SF; the
  * single-aggregate / single-window families below must never grow an
  * exchange at any SF.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // query -> exact shuffle-exchange count (BroadcastExchange excluded)
  private val pinned: Map[String, Int] = Map(
    "q01_pruned_agg" -> 1,      // scan -> partial agg -> 1 keyed exchange
    "q15_time_bucket" -> 2,     // hourly agg + the countDistinct expansion
    "q19_exact_dedup" -> 1,     // hash-groupBy dedup
    "q69_sessionize" -> 1,      // ONE user-keyed shuffle serves window+sum+agg
    "q73_window_ranks" -> 1,    // one keyed window exchange
    "q82_grouping_sets" -> 1,   // Expand folds into the same single aggregate
    "q84_unpivot" -> 1,         // unpivot-as-Expand, same single aggregate
    "q86_salted_distinct" -> 3, // (type,salt[,user]) expansion + 2-stage fold
    "q87_window_dedup" -> 1,    // one user-keyed window shuffle
    "q88_hash_sample" -> 1,     // one lang-keyed window shuffle
    // DistributedRank.prefix: shard-partials agg + metadata-sized base
    // window + shard-local window (the range exchange hides behind the
    // operator's localCheckpoint) — 3 visible, every one shard-bounded
    "q98_token_budget_mix" -> 3
  )

  test("pinned no-join queries keep their exact shuffle counts") {
    val bad = pinned.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val got = lines.count(_.contains("Exchange")) -
        lines.count(_.contains("BroadcastExchange"))
      if (got != want) Some(s"$name: $got exchanges (pinned $want)") else None
    }
    assert(bad.isEmpty, s"plan-shape drift:\n${bad.mkString("\n")}")
  }

  test("q88 pre-trims before the lang-keyed window shuffle") {
    // the partition-local bounded-heap trim (TopK.perPartitionSmallestByKey)
    // must sit BELOW the window's exchange — i.e. the shuffle input is
    // the trimmed set, not the full corpus (round-10 watch-list item)
    val lines = SparkEntry.queries("q88_hash_sample")(spark, dir)
      .queryExecution.executedPlan.toString.split("\n")
    val exchange = lines.indexWhere(l => l.contains("Exchange") && !l.contains("Broadcast"))
    val trim = lines.indexWhere(_.contains("MapPartitions"))
    assert(exchange >= 0 && trim >= 0, s"missing node:\n${lines.mkString("\n")}")
    // plans print root-first, so upstream (scan-side) nodes appear later
    assert(exchange < trim,
      s"trim is not upstream of the window exchange:\n${lines.mkString("\n")}")
  }

  test("pagerank iteration layout: checkpointed src-partitioned edges plan zero edge-side exchanges") {
    import org.apache.spark.sql.functions._
    // The shape PageRankFixed.run builds per iteration: edges are
    // repartition(src) + persist, and the cache is MATERIALIZED before
    // the iteration plans are built (run()'s nodes.count() does this),
    // at which point the cached AdaptiveSparkPlan is final and its
    // hash partitioning is visible to EnsureRequirements — so a forced
    // shuffle join on src adds an exchange ONLY under the rank side,
    // plus the dst aggregate. Two ENSURE_REQUIREMENTS exchanges total;
    // the edge-sized relation never moves (its only exchange is the
    // one-time REPARTITION_BY_COL layout inside the cache). Depends on
    // canChangeCachedPlanOutputPartitioning=false in GraftSession — if
    // AQE were allowed to re-coalesce the cached shuffle, the layout
    // guarantee (and this pin) would silently break.
    val e = spark.range(1000)
      .selectExpr("concat('s', id % 50) AS src", "concat('p', id % 97) AS dst")
      .repartition(col("src")).persist()
    try {
      e.count() // materialize the cache BEFORE planning the consumer
      val r = spark.range(50)
        .selectExpr("concat('s', id) AS src", "id * 1000 AS rank_scaled")
      val it = e.hint("merge").join(r, Seq("src"))
        .groupBy("dst").agg(sum("rank_scaled").as("m"))
      val lines = it.queryExecution.executedPlan.toString.split("\n")
      val got = lines.count(_.contains("ENSURE_REQUIREMENTS"))
      assert(got == 2,
        s"expected 2 ENSURE_REQUIREMENTS exchanges (rank side + dst agg), " +
          s"got $got:\n${lines.mkString("\n")}")
      val edgeSide = lines.indexWhere(_.contains("InMemoryTableScan"))
      val aboveEdge = lines.take(edgeSide).lastIndexWhere(_.contains("SortMergeJoin"))
      assert(aboveEdge >= 0 && !lines.slice(aboveEdge, edgeSide).exists(
        _.contains("ENSURE_REQUIREMENTS")),
        s"edge side re-exchanged:\n${lines.mkString("\n")}")
    } finally e.unpersist()
  }

  test("q106 pushes its predicate into the ORC scan and prunes the schema") {
    val plan = SparkEntry.queries("q106_orc_scan")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), IsNotNull(value)") ||
      plan.contains("EqualTo(event_type,purchase)"),
      s"q106 predicate not pushed into the ORC reader:\n$plan")
    // projection must reach the reader: only the three live columns
    assert(!plan.contains("user_id") && !plan.contains("props"),
      s"q106 ORC ReadSchema not pruned:\n$plan")
  }

  test("no corpus-sized single-partition or low-cardinality window in any query") {
    // Round-12 weak flag, generalized into a net: every logical Window
    // node in every SparkEntry query must be partitioned, and for the
    // DistributedRank-rewritten family the partition key must be the
    // range shard (__part) / time chunk (__chunk) — or the window must
    // sit on the operator's shard-partials Aggregate, which is
    // metadata-sized (≤ shards + |groups| rows) by construction.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // q91: rank over the distinct-calendar table; q107: ≥5-error hour
    // cells — both metadata-sized by construction (documented since
    // their rounds; the two known WindowExec warnings in the bench log)
    val emptyOk = Set("q91_dpp", "q107_interval_join")
    val sharded = Seq("q98_token_budget_mix", "q120_bpe_budget_mix",
      "q127_pps_sample", "q128_rank_features", "q131_rolling_features",
      "q121_training_set")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan = fn(spark, dir).queryExecution.optimizedPlan
      plan.foreach {
        case w: LWindow =>
          if (w.partitionSpec.isEmpty && !emptyOk.contains(name))
            bad += s"$name: unpartitioned Window (single task at any scale)"
          else if (sharded.contains(name) && w.partitionSpec.nonEmpty) {
            val onShard = w.partitionSpec.exists(_.references.exists(a =>
              a.name == "__part" || a.name == "__chunk"))
            val onPartials = w.child.collectFirst {
              case a: Aggregate if a.groupingExpressions.exists(
                _.references.exists(_.name == "__part")) => a
            }.nonEmpty
            if (!onShard && !onPartials)
              bad += s"$name: Window partitioned by neither shard nor " +
                s"chunk and not over shard partials: ${w.partitionSpec}"
          }
        case _ =>
      }
    }
    assert(bad.isEmpty, s"window-shape violations:\n${bad.mkString("\n")}")
  }

  test("q84 plans unpivot as Expand; q82 plans grouping sets as Expand") {
    for (q <- Seq("q84_unpivot", "q82_grouping_sets")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"$q lost its Expand node:\n$plan")
    }
  }
}
