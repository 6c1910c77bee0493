package graft.tools

import org.apache.spark.sql.functions._

/** Scale soak of the round-13 changes on the SoakGen 10× corpus:
  * the DistributedRank rewrites (q98/q120/q127/q128/q131 — every
  * former low-cardinality window now shard- or chunk-partitioned),
  * the production-vocab BPE pair (q120/q125), the k-anonymity ladder
  * (q132), clustering coefficient (q133), and the stage-cached
  * composed pipeline (q121). One run each: wall time + plan
  * shuffle/broadcast counts, which must match the sf0.01 PlanAudit
  * rows — a scale step changes data volume, never plan shape.
  *
  * Second section: the DistributedRank shard-scaling point the
  * round-12 verdict asked for — the same per-group rank over the 10×
  * orders table at 4 vs 32 range shards; the window stage is
  * per-shard, so more shards = more parallel sort tasks (wall time
  * must NOT degrade with shard count, unlike a partitionBy(key)
  * window, which is pinned at |keys| tasks forever).
  * Diagnostic main, not part of the driver contract.
  */
object SoakRound13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-round13")
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q98_token_budget_mix", "q120_bpe_budget_mix",
      "q121_training_set", "q125_bpe_seq_packing", "q127_pps_sample",
      "q128_rank_features", "q129_funnel", "q131_rolling_features",
      "q132_k_anon_ladder", "q133_clustering_coeff",
      "q134_repetition_score", "q135_group_best", "q136_vocab_coverage",
      "q137_edge_support", "q138_ktruss")
    targets.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      val broadcasts = lines.count(_.contains("BroadcastExchange"))
      val shuffles = lines.count(_.contains("Exchange")) - broadcasts
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = fn(spark, dir).count()
      println(f"SOAK $name rows=$rows sec=$sec%.2f shuffles=$shuffles broadcasts=$broadcasts")
    }
    // shard-scaling point: same rank computation, 4 vs 32 shards
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    for (shards <- Seq(4, 32)) {
      val t0 = System.nanoTime()
      val n = graft.operators.DistributedRank.prefix(orders,
        Seq("o_orderpriority"), Seq("o_totalprice", "o_orderkey"),
        numShards = shards).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SHARDS $shards rows=$n sec=$sec%.2f")
    }
    spark.stop()
  }
}
