package graft.fed

import org.apache.spark.sql.SparkSession

import graft.fed.FedAvg.Weights
import graft.sources.{GraftLogger, WeightsIO}

/** §2.9 — the model contract the federation loop trains against
  * (README.md:23-52: initialize / set_weights / get_weights / fit /
  * evaluate / gen_embeddings). A FedModel instance lives INSIDE one
  * executor task and owns one partition's in-memory training state —
  * the reference's one-partition-per-process design (mem.py sizes it).
  */
trait FedModel extends Serializable {
  /** FedAvg weight n_i (A4 — reference returns it from initialize,
    * models/supervised.py:106-107). */
  def numExamples: Long
  def getWeights: Weights
  def setWeights(w: Weights): Unit
  /** Train locally for `epochs`; returns the updated weights. */
  def fit(epochs: Int): Weights
  /** Named eval metrics (loss/acc/precision/recall/auc...). */
  def evaluate(): Map[String, Double]
}

/** §3.1 — the federated round loop, Spark-native.
  *
  * The reference's TCP server/client pair (fl_server.py:134-172,
  * fl_client.py:119-175) is deployment plumbing around a simple
  * computation: R rounds of { send global weights to all clients; each
  * trains E epochs locally; server FedAvgs the results }. In Spark the
  * driver IS the server: per round it broadcasts the global weights,
  * runs one task per partition (the client), collects the per-client
  * `(n_i, W_i)` pairs, folds FedAvg, and checkpoints — identical
  * algebra, no sockets/pickle (documented deviation, SURVEY §7.4-5).
  *
  * Scale: weights are KB–MB (broadcast-friendly); clients train
  * data-local inside tasks; the collect moves `clients × model-size`,
  * same as the reference's network traffic. For thousands of clients
  * swap the collect for `FedAvg.weightedTree`.
  */
object Federation {

  /** How per-round client updates are combined into the global model.
    * The algebra is identical across strategies (FedAvgAggregatorSpec /
    * FedAvgSpec assert fold ≡ tree ≡ Aggregator); they differ in WHERE
    * the combine runs:
    *  - DriverFold: collect every (n_i, W_i) and fold on the driver —
    *    the reference server's topology, right up to thousands of
    *    clients (weights are KB–MB).
    *  - TreeAggregate: `FedAvg.weightedTree` — O(log n) combine depth
    *    across executors, driver receives ONE model. The million-client
    *    path.
    *  - SqlAggregator: `FedAvgAggregator` through Spark's aggregation
    *    machinery (map-side partial buffers + exchange) — same scale
    *    story as TreeAggregate, and the same code path a SQL-surface
    *    caller (`updates.select(FedAvgAggregator.column)`) gets.
    */
  sealed trait AggStrategy
  object AggStrategy {
    case object DriverFold extends AggStrategy
    case object TreeAggregate extends AggStrategy
    case object SqlAggregator extends AggStrategy
  }

  final case class RoundLog(round: Int, totalExamples: Long,
                            clientMetrics: Seq[(String, Map[String, Double])])

  /** `finalMetrics`: per-client evaluation of the FINAL global weights
    * — the reference client's on-STOP evaluate + F1
    * (fl_client.py:129-142).
    * `clientRebuilds`: buildClient invocations BEYOND the initial one
    * per partition — >0 means Spark evicted a cached client mid-session
    * and optimizer state was silently reset (weights stay correct).
    * Always 0 for `runScheduled`, whose per-round rebuild is the design.
    */
  final case class Result(weights: Weights, history: Seq[RoundLog],
                          finalMetrics: Seq[(String, Map[String, Double])],
                          clientRebuilds: Long = 0L)

  /** @param buildClient constructs/loads a partition's model ON AN
    *   EXECUTOR (must be a serializable closure; typically reads the
    *   partition's node/edge files from shared storage). Built ONCE:
    *   clients live in a persisted RDD across rounds — like the
    *   reference's long-lived client processes (fl_client.py:119-175),
    *   only the weights travel per round; partition data is not
    *   re-loaded and optimizer state persists. (If an executor is lost,
    *   Spark recomputes the partition — the client reloads with fresh
    *   optimizer slots; deterministic, weights-correct fallback.)
    * @param initial    round-0 global weights (the reference server
    *   builds a throwaway model just for these, fl_server.py:211-212)
    * @param weightsDir if set, checkpoint `weights_graphID:{gid}_V{r}`
    *   per round (S9 parity, fl_server.py:79-80)
    * @param unweighted true = A2 aggregation, every client counts once
    *   (`np.mean`, fl_server_unsupervised.py:58-67 — the unsupervised
    *   server's rule); false = A1 example-count-weighted FedAvg
    */
  def run[P: scala.reflect.ClassTag](spark: SparkSession,
             partitions: Seq[P],
             buildClient: P => FedModel,
             initial: Weights,
             rounds: Int,
             epochs: Int,
             graphId: String = "0",
             weightsDir: Option[String] = None,
             unweighted: Boolean = false,
             agg: AggStrategy = AggStrategy.DriverFold,
             logger: GraftLogger = GraftLogger.stdout()): Result = {
    val sc = spark.sparkContext
    // counts buildClient invocations: growth past partitions.size means
    // Spark evicted a cached client and rebuilt it with fresh optimizer
    // slots — weights stay correct, but the "optimizer state persists"
    // contract degraded; surface it instead of absorbing it silently
    val builds = sc.longAccumulator("graft.clientBuilds")
    val clients = sc.parallelize(partitions, partitions.size)
      .map { p => builds.add(1L); (p.toString, buildClient(p)) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    clients.count() // materialize every client (bundle load) exactly once
    var buildsSeen = builds.value
    var global = initial
    val history = Seq.newBuilder[RoundLog]
    val t0 = System.nanoTime()
    for (round <- 1 to rounds) {
      val bc = sc.broadcast(global)
      val updatesRdd = clients
        .map { case (name, client) =>
          client.setWeights(bc.value)
          val before = client.evaluate()
          val w = client.fit(epochs)
          (name, client.numExamples, w, before)
        }
      val (combined, nClients, totalExamples, clientMetrics) =
        combineRound(spark, updatesRdd, agg, unweighted)
      global = combined
      bc.destroy()
      if (builds.value > buildsSeen) {
        logger.info(s"WARNING: ${builds.value - buildsSeen} client(s) were " +
          s"rebuilt in round $round (cache eviction) — optimizer state reset")
        buildsSeen = builds.value
      }
      weightsDir.foreach { dir =>
        WeightsIO.save(spark, global, s"$dir/weights_graphID:${graphId}_V$round")
      }
      val log = RoundLog(round, totalExamples, clientMetrics)
      history += log
      logger.info(s"Training cycle $round done; clients=$nClients, " +
        s"examples=${log.totalExamples}")
    }
    val res = runFinalEval(sc, clients, global, history.result(), logger, t0, rounds)
    res.copy(clientRebuilds = builds.value - partitions.size)
  }

  /** One round's combine, shared by `run` and `runScheduled`: reduce the
    * per-client `(name, n_i, W_i, metrics)` RDD to the new global model
    * under the chosen [[AggStrategy]], returning (global, nClients,
    * totalExamples, perClientMetrics). The algebra is identical across
    * strategies; they differ only in WHERE the weighted mean runs.
    */
  private def combineRound(spark: SparkSession,
      updatesRdd: org.apache.spark.rdd.RDD[(String, Long, Weights, Map[String, Double])],
      agg: AggStrategy, unweighted: Boolean)
      : (Weights, Int, Long, Seq[(String, Map[String, Double])]) = agg match {
    case AggStrategy.DriverFold =>
      // reference topology: every (n_i, W_i) lands on the driver
      val updates = updatesRdd.collect().toSeq
      val global =
        if (unweighted) FedAvg.mean(updates.map(_._3))
        else FedAvg.weighted(updates.map(u => (u._2, u._3)))
      (global, updates.size, updates.map(_._2).sum, updates.map(u => (u._1, u._4)))
    case distributed =>
      // scale topology: weights combine across executors; the
      // driver collects only the (name, n, metrics) metadata.
      // MEMORY_AND_DISK: eviction spills rather than re-running
      // fit() (a re-run would advance optimizer state twice).
      updatesRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val weightedUpdates = updatesRdd
        .map { case (_, n, w, _) => (if (unweighted) 1L else n, w) }
      val global = distributed match {
        case AggStrategy.TreeAggregate => FedAvg.weightedTree(weightedUpdates)
        case _ =>
          implicit val enc: org.apache.spark.sql.Encoder[(Long, Weights)] =
            org.apache.spark.sql.Encoders.kryo[(Long, Weights)]
          spark.createDataset(weightedUpdates)
            .select(FedAvgAggregator.column).head()
      }
      val meta = updatesRdd
        .map { case (name, n, _, before) => (name, n, before) }.collect().toSeq
      updatesRdd.unpersist(blocking = false)
      (global, meta.size, meta.map(_._2).sum, meta.map(m => (m._1, m._3)))
  }

  private def runFinalEval(sc: org.apache.spark.SparkContext,
                           clients: org.apache.spark.rdd.RDD[(String, FedModel)],
                           global: Weights, history: Seq[RoundLog],
                           logger: GraftLogger, t0: Long, rounds: Int): Result = {
    // on-STOP evaluation of the final global model (fl_client.py:129-142)
    val bcFinal = sc.broadcast(global)
    val finalMetrics = clients.map { case (name, client) =>
      client.setWeights(bcFinal.value)
      (name, client.evaluate())
    }.collect().toSeq
    bcFinal.destroy()
    clients.unpersist(blocking = false)
    logger.info(f"Federation finished: $rounds rounds in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    Result(global, history, finalMetrics)
  }

  /** §3.2 — the SCHEDULED variant (fl_client_shed.py:151-206 +
    * fl_server_shed.py:61-93): partitions are packed into groups under
    * a RAM budget (`MemCost.pack` — the reference's `mem.py` admission
    * model); per round, each GROUP is one executor task that trains its
    * partitions SEQUENTIALLY — a fresh model per partition per round,
    * exactly as the shed client builds and discards models
    * (fl_client_shed.py:166-193) — and FedAvg runs over the
    * PER-PARTITION `(n_p, W_p)` pairs, not per-group, matching
    * fl_server_shed's accumulate loop.
    *
    * Scale: group parallelism × per-group sequential training bounds
    * peak memory at `budgetGB` per task; the per-round rebuild is the
    * POINT here (memory is released between partitions, the reference's
    * `del` + `gc.collect()`), unlike `run`'s persistent clients.
    */
  def runScheduled[P: scala.reflect.ClassTag](spark: SparkSession,
             partitions: Seq[P],
             cost: P => Double,
             budgetGB: Double,
             buildClient: P => FedModel,
             initial: Weights,
             rounds: Int,
             epochs: Int,
             graphId: String = "0",
             weightsDir: Option[String] = None,
             agg: AggStrategy = AggStrategy.DriverFold,
             logger: GraftLogger = GraftLogger.stdout()): Result = {
    val sc = spark.sparkContext
    val groups = MemCost.pack(partitions, budgetGB)(cost)
    logger.info(s"scheduled federation: ${partitions.size} partitions in " +
      s"${groups.size} groups under $budgetGB GB")
    var global = initial
    val history = Seq.newBuilder[RoundLog]
    val t0 = System.nanoTime()
    for (round <- 1 to rounds) {
      val bc = sc.broadcast(global)
      val updatesRdd = sc.parallelize(groups, groups.size)
        .flatMap { group =>
          // sequential within the group — at most one partition's model
          // alive at a time (the budget contract)
          group.map { p =>
            val client = buildClient(p)
            client.setWeights(bc.value)
            val before = client.evaluate()
            val w = client.fit(epochs)
            (p.toString, client.numExamples, w, before)
          }
        }
      // FedAvg over the PER-PARTITION (n_p, W_p) pairs (fl_server_shed's
      // accumulate loop), under the same strategy options as `run` —
      // shed updates are small by construction, but the scheduled path
      // should not be structurally barred from tree-combining.
      val (combined, nParts, totalExamples, partMetrics) =
        combineRound(spark, updatesRdd, agg, unweighted = false)
      global = combined
      bc.destroy()
      weightsDir.foreach { dir =>
        WeightsIO.save(spark, global, s"$dir/weights_graphID:${graphId}_V$round")
      }
      val log = RoundLog(round, totalExamples, partMetrics)
      history += log
      logger.info(s"[shed] cycle $round done; partitions=$nParts, " +
        s"examples=${log.totalExamples}")
    }
    // final evaluation with fresh per-partition models (shed clients are
    // rebuilt every pass by design)
    val bcFinal = sc.broadcast(global)
    val finalMetrics = sc.parallelize(groups, groups.size)
      .flatMap(_.map { p =>
        val client = buildClient(p)
        client.setWeights(bcFinal.value)
        (p.toString, client.evaluate())
      })
      .collect().toSeq
    bcFinal.destroy()
    logger.info(f"[shed] federation finished: $rounds rounds in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    Result(global, history.result(), finalMetrics)
  }
}
