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

  final case class RoundLog(round: Int, totalExamples: Long,
                            clientMetrics: Seq[(String, Map[String, Double])])

  final case class Result(weights: Weights, history: Seq[RoundLog])

  /** @param buildClient constructs/loads a partition's model ON AN
    *   EXECUTOR (must be a serializable closure; typically reads the
    *   partition's node/edge files from shared storage)
    * @param initial    round-0 global weights (the reference server
    *   builds a throwaway model just for these, fl_server.py:211-212)
    * @param weightsDir if set, checkpoint `weights_graphID:{gid}_V{r}`
    *   per round (S9 parity, fl_server.py:79-80)
    */
  def run[P: scala.reflect.ClassTag](spark: SparkSession,
             partitions: Seq[P],
             buildClient: P => FedModel,
             initial: Weights,
             rounds: Int,
             epochs: Int,
             graphId: String = "0",
             weightsDir: Option[String] = None,
             logger: GraftLogger = GraftLogger.stdout()): Result = {
    val sc = spark.sparkContext
    var global = initial
    val history = Seq.newBuilder[RoundLog]
    val t0 = System.nanoTime()
    for (round <- 1 to rounds) {
      val bc = sc.broadcast(global)
      val updates = sc.parallelize(partitions, partitions.size)
        .map { p =>
          val client = buildClient(p)
          client.setWeights(bc.value)
          val before = client.evaluate()
          val w = client.fit(epochs)
          (p.toString, client.numExamples, w, before)
        }
        .collect()
        .toSeq
      bc.destroy()
      global = FedAvg.weighted(updates.map(u => (u._2, u._3)))
      weightsDir.foreach { dir =>
        WeightsIO.save(spark, global, s"$dir/weights_graphID:${graphId}_V$round")
      }
      val log = RoundLog(round, updates.map(_._2).sum,
        updates.map(u => (u._1, u._4)))
      history += log
      logger.info(s"Training cycle $round done; clients=${updates.size}, " +
        s"examples=${log.totalExamples}")
    }
    logger.info(f"Federation finished: $rounds rounds in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    Result(global, history.result())
  }
}
