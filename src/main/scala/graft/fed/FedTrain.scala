package graft.fed

import org.apache.spark.sql.SparkSession

import graft.etl.MergePipeline
import graft.graph.PropertyGraph
import graft.ml.{BundleIO, LocalGraphSage, SageHyperParams, SageLinkModel}
import graft.sources.GraftLogger

/** CLI entry point for a full supervised federated GraphSAGE training
  * session — the reference's `fl_server.py` + N × `fl_client.py`
  * deployment collapsed into one Spark driver program (SURVEY §3.1
  * restatement; README.md:86-98's example run shape):
  *
  *   runMain graft.fed.FedTrain <storeDir> <graphId> <pids> <rounds>
  *       <epochs> <outDir>
  *   e.g.  /root/reference/data 4 0,1 3 2 /tmp/fed-out
  *
  * Pipeline: merge.py-parity ETL per partition → distributed bundle
  * write (splits + storage; driver holds only paths) → throwaway model
  * for round-0 weights (fl_server.py:211-212) → R federated rounds
  * (broadcast → task-local train → FedAvg → checkpoint) → final
  * evaluation + per-partition embedding CSVs.
  */
object FedTrain {

  final case class SessionResult(result: Federation.Result,
                                 refs: Seq[BundleIO.BundleRef])

  /** Programmatic form used by the CLI and the end-to-end spec. */
  def runSession(spark: SparkSession, storeDir: String, graphId: String,
                 pids: Seq[String], rounds: Int, epochs: Int, outDir: String,
                 hp: SageHyperParams = SageHyperParams(),
                 logger: GraftLogger = GraftLogger.stdout()): SessionResult = {
    // 1. ETL: merge raw local/central stores into canonical node/edge
    //    tables (merge.py parity), then split + persist bundles.
    val refs = pids.map { pid =>
      val m = MergePipeline.merge(spark, storeDir, storeDir, graphId, pid)
      val g = PropertyGraph(m.nodes, m.edges).cache()
      val ref = BundleIO.write(spark, s"$outDir/bundles", s"${graphId}_$pid", g,
        seed = hp.seed)
      g.unpersist()
      ref
    }
    require(refs.map(_.numFeatures).distinct.size == 1,
      s"partitions disagree on feature count: $refs")

    // 2. Round-0 weights from a throwaway model (fl_server.py:211-212 —
    //    the server builds a model solely to obtain initial weights).
    val init = new LocalGraphSage(hp, Map.empty, Map.empty, refs.head.numFeatures)
      .initializeWeights()

    // 3. Federated rounds; per-round checkpoints under outDir/weights.
    val result = Federation.run(spark, refs,
      (r: BundleIO.BundleRef) => SageLinkModel.fromRef(r, hp),
      init, rounds, epochs, graphId,
      weightsDir = Some(s"$outDir/weights"), logger = logger)

    result.finalMetrics.foreach { case (name, m) =>
      logger.info(s"final[$name]: " + m.toSeq.sortBy(_._1)
        .map { case (k, v) => f"$k=$v%.4f" }.mkString(" "))
    }
    SessionResult(result, refs)
  }

  def main(args: Array[String]): Unit = {
    val storeDir = args.lift(0).getOrElse("/root/reference/data")
    val graphId = args.lift(1).getOrElse("4")
    val pids = args.lift(2).getOrElse("0,1").split(",").toSeq
    val rounds = args.lift(3).map(_.toInt).getOrElse(3)
    val epochs = args.lift(4).map(_.toInt).getOrElse(2)
    val outDir = args.lift(5).getOrElse("/tmp/graft-fed")
    val spark = graft.GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, app = "graft-fedtrain")
    spark.sparkContext.setLogLevel("WARN")
    try runSession(spark, storeDir, graphId, pids, rounds, epochs, outDir)
    finally spark.stop()
  }
}
