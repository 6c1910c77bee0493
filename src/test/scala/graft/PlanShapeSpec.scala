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
    // DistributedRank.prefix shape (rewritten round 14 off the 5-task
    // priority window): shard-partials agg + metadata-sized base
    // window + shard-local window
    "q73_window_ranks" -> 3,
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
    // Round-12 weak flag, generalized into a net, EXTENDED in round 14
    // (the round-13 verdict: q73/q105 slipped through because the net
    // only rejected UNPARTITIONED windows globally). Every logical
    // Window node in every SparkEntry query must satisfy one of:
    //   (a) a partition key is the range shard (__part) / time chunk
    //       (__chunk/__day) — parallelism grows with data, not key
    //       cardinality;
    //   (b) a partition key is a provably high-cardinality column
    //       (an id/key/hash/doc/user/query/vocab column — grows with
    //       the data);
    //   (c) the window sits on an Aggregate whose grouping includes
    //       __part (DistributedRank's shard-partials table, ≤ shards +
    //       |groups| rows) or whose grouping keys are ALL
    //       low-cardinality (output ≤ the product of those
    //       cardinalities — metadata-sized regardless of input scale);
    //   (d) a documented bounded-input exemption below.
    // Anything else is the last-reducer shape: the table funnels
    // through |key| sort tasks at any scale.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // q91: rank over the distinct-calendar table; q107: ≥5-error hour
    // cells — both metadata-sized by construction (documented since
    // their rounds; the two known WindowExec warnings in the bench log)
    val emptyOk = Set("q91_dpp", "q107_interval_join")
    // bounded inputs the PLAN cannot show (checkpoint barrier or
    // physical artifact hides the reducing subtree):
    //   q88 — window input pre-trimmed by TopK.perPartitionSmallestByKey
    //         to ≤ k × partitions rows per lang (HashSampleSpec pins it);
    //   q64 — window input is the persisted (event_type, day, bin)
    //         sketch parquet: bins fixed, rows grow with time span only;
    //   q151 — window input is the checkpointed (source, score)
    //          histogram: scores are 0..10 integers, ≤ 11 rows per
    //          source forever (the checkpoint hides the reducing
    //          Aggregate from rule (c)).
    val boundedOk = Set("q88_hash_sample", "q64_daily_quantile_sketch",
      "q151_source_quality")
    // names that grow with the data: ids/keys/hashes/docs/users/queries,
    // vocabulary tokens/terms/words, md5 groups, day buckets. Low-card
    // names (priority, type, lang, source, split, flag…) deliberately
    // do NOT match.
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
      bad ++= windowViolations(name,
        fn(spark, dir).queryExecution.optimizedPlan, emptyOk, boundedOk)
    assert(bad.isEmpty, s"window-shape violations:\n${bad.mkString("\n")}")
  }

  // names that grow with the data: ids/keys/hashes/docs/users/queries,
  // vocabulary tokens/terms/words, md5 groups, day buckets. Low-card
  // names (priority, type, lang, source, split, flag…) deliberately
  // do NOT match.
  private val highCard =
    "(?i)(key$|_id$|^id$|grp|hash|doc|user|query|vec|term|tok|word|__day)".r
  private def isScaling(n: String): Boolean =
    n == "__part" || n == "__chunk" || highCard.findFirstIn(n).isDefined

  // CONTRACT-BOUNDED keys (round-15 item 7): columns that NAME-match
  // the high-cardinality rule but are bounded batches by operator
  // contract — retrieval query/probe batches are ~5 ids at any corpus
  // scale, so a window keyed by one is the last-reducer shape unless
  // its input was pre-trimmed. The net does NOT trust the name for
  // these: rule (b) skips them, and instead the window must read a
  // bounded-heap pre-trim (a MapPartitions below it — the
  // TopK.rankedTopKDesc discipline) or qualify via the other rules.
  private val boundedKeys = Set("query_id")

  private def windowViolations(
      name: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      emptyOk: Set[String] = Set.empty,
      boundedOk: Set[String] = Set.empty): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
      MapPartitions, Project, SerializeFromObject, WindowGroupLimit,
      Window => LWindow}
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    // The pre-trim must sit in the window child's DIRECT unary lineage
    // (only narrow row-level ops between them) — an unrelated
    // mapPartitions buried below a join/aggregate/window must NOT
    // rescue an untrimmed plan (round-15 ADVICE).
    @annotation.tailrec
    def directPreTrim(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p match {
        case _: MapPartitions => true
        case n: Project => directPreTrim(n.child)
        case n: Filter => directPreTrim(n.child)
        case n: SerializeFromObject => directPreTrim(n.child)
        // InferWindowGroupLimit (Spark 3.5+) wedges its own rank-limit
        // node between the window and the trim — transparent here
        case n: WindowGroupLimit => directPreTrim(n.child)
        case _ => false
      }
    plan.foreach {
      case w: LWindow =>
        val keys = w.partitionSpec.flatMap(_.references.map(_.name)).distinct
        lazy val childAgg = w.child.collectFirst { case a: Aggregate =>
          a.groupingExpressions.flatMap(_.references.map(_.name)).distinct }
        // (e) a contract-bounded batch key counts ONLY with the
        // bounded-heap pre-trim feeding the window (q88 discipline)
        lazy val hasPreTrim = directPreTrim(w.child)
        val ok =
          (w.partitionSpec.isEmpty && emptyOk.contains(name)) ||
          keys.filterNot(boundedKeys).exists(isScaling) ||           // (a)+(b)
          childAgg.exists(g => g.contains("__part") ||               // (c)
            (g.nonEmpty && !g.exists(isScaling))) ||
          boundedOk.contains(name) ||                                // (d)
          (keys.exists(boundedKeys) && hasPreTrim)                   // (e)
        if (!ok)
          bad += s"$name: Window over low-cardinality keys " +
            s"[${keys.mkString(",")}] on a non-metadata input " +
            s"(one sort task per key value at scale)"
      case _ =>
    }
    bad.toSeq
  }

  test("the extended window net is red on the round-13 naive q73/q105 shapes") {
    // negative control (round-13 verdict done-criterion): rebuild the
    // EXACT plans the old q73/q105 shipped and assert the net now
    // rejects both — so the next low-cardinality window cannot land.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val t = Tables(spark, dir)
    val oldQ73 = {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t.orders.select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 9).as("pct_rank"),
        round(cume_dist().over(w), 9).as("cume"))
    }
    val oldQ105 = {
      val docs = t.documents.select(col("doc_id"), col("lang"),
        md5(col("text")).as("grp"))
      docs.groupBy(col("grp")).agg(min(col("lang")).as("rep_lang"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("rep_lang")).orderBy(col("grp"))))
        .withColumn("__n", count(lit(1)).over(
          Window.partitionBy(col("rep_lang"))))
    }
    // round-15 negative control: the EXACT round-14 q146 tail — the
    // per-query top-k window directly on the scored (query, doc) table
    // (no pre-trim). `query_id` name-matches the high-cardinality rule
    // but is contract-bounded at 5, so rule (b) must NOT rescue it.
    val oldQ146 = {
      val docs = t.documents
      val tf = docs.select(col("doc_id"),
          explode(graft.llm.TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val qterms = docs.filter(col("doc_id").isin(1L, 7L))
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(graft.llm.TextOps.tokens(col("text")))).as("term"))
      val scored = qterms.join(tf, Seq("term"))
        .filter(col("query_id") =!= col("doc_id"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("tf")).as("score"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
    }
    // round-16 negative control (ADVICE): an UNRELATED mapPartitions
    // buried below the scoring aggregate must not rescue an untrimmed
    // bounded-key window — rule (e) demands the trim in the window
    // child's direct unary lineage.
    val oldQ146Masked = {
      val docs0 = t.documents.select(col("doc_id"), col("text"))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(docs0.schema)
      val docs = docs0.mapPartitions(identity(_))(enc)
      val tf = docs.select(col("doc_id"),
          explode(graft.llm.TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val qterms = docs.filter(col("doc_id").isin(1L, 7L))
        .select(col("doc_id").as("query_id"),
          explode(array_distinct(graft.llm.TextOps.tokens(col("text")))).as("term"))
      val scored = qterms.join(tf, Seq("term"))
        .filter(col("query_id") =!= col("doc_id"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("tf")).as("score"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
    }
    for ((nm, df) <- Seq("old_q73" -> oldQ73, "old_q105" -> oldQ105,
        "old_q146" -> oldQ146, "old_q146_masked" -> oldQ146Masked)) {
      val v = windowViolations(nm, df.queryExecution.optimizedPlan)
      assert(v.nonEmpty, s"net failed to flag the naive $nm plan")
    }
  }

  test("no parquet scan DataFilter carries an inlined heavy expression") {
    // Round-15 finding, generalized into a net: a filter (explicit
    // size(arr) > 0, or one inferred by InferFiltersFromGenerate from
    // an explode) whose operand is an ALIAS of a heavy expression gets
    // the whole expression INLINED into the scan's DataFilters —
    // evaluated once per row in the scan on top of the projection's
    // copy, interpreted (measured 8× on q156, 1.7× on q63). Heavy =
    // any higher-order lambda or the text/vector fingerprint family;
    // a bare md5/pmod filter is a legitimate pushed predicate and
    // stays allowed (q45/q105 filter ON md5 semantics deliberately).
    val heavy = Seq("lambdafunction", "winnow", "minhash", "shingle",
      "simhash", "hyperplane")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val scans = fn(spark, dir).queryExecution.executedPlan.toString
        .split("\n").filter(_.contains("DataFilters"))
      scans.filter(l => heavy.exists(h => l.toLowerCase.contains(h)))
        .take(1).foreach(l =>
          bad += s"$name: heavy expression inlined into a scan filter: " +
            l.trim.take(120))
    }
    assert(bad.isEmpty, s"generate-filter inlining:\n${bad.mkString("\n")}")
  }

  test("q84 plans unpivot as Expand; q82 plans grouping sets as Expand") {
    for (q <- Seq("q84_unpivot", "q82_grouping_sets")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"$q lost its Expand node:\n$plan")
    }
  }
}
