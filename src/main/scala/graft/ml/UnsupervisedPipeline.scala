package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.ConcatEmbeddings
import graft.fed.Federation
import graft.graph.PropertyGraph
import graft.sources.{GraftLogger, GraphIO}

/** The unsupervised embedding producers:
  *
  *  - `run` — ZERO-federation baseline (distributed_nograd.py:19-34):
  *    each partition trains independently on its walk-pair corpus and
  *    writes `embeddings_nograd_{gid}_{pid}.csv`.
  *  - `runFederated` — the federated variant (fl_server_unsupervised +
  *    fl_client_unsupervised): R rounds of walk-pair training with the
  *    UNWEIGHTED model mean (A2, fl_server_unsupervised.py:58-67),
  *    then every client runs the FINAL global encoder over its nodes
  *    and writes `embeddings_{gid}_{pid}.csv`
  *    (fl_client_unsupervised.py:117-122).
  *
  * Both feed ConcatEmbeddings (concat_embeddings.py:12-28) to union +
  * keep-first-dedup the per-partition tables.
  *
  * Execution shape: one Spark task per partition — the task loads its
  * bundle (data-local), trains, and EMITS the embedding rows as RDD
  * output; embeddings flow task → CSV sink as a DataFrame, never
  * through a driver collect. Weights (KB–MB) are the only thing the
  * driver holds.
  */
object UnsupervisedPipeline {

  /** Per-partition unsupervised bundles (walk pairs as the train set).
    * Partitions are independent and bundle writes are order-canonical,
    * so their walk-corpus jobs submit concurrently from driver threads
    * (same rationale as FedTrain's ETL).
    */
  private def writeBundles(spark: SparkSession, parts: Seq[(String, PropertyGraph)],
                           graphId: String, outDir: String, hp: SageHyperParams,
                           walkLength: Int, nWalks: Int): Seq[(String, BundleIO.BundleRef)] =
    graft.util.Par.mapAll(parts) { case (pid, g) =>
      pid -> BundleIO.writeUnsupervised(spark, s"$outDir/bundles",
        s"${graphId}_$pid", g, walkLength, nWalks, hp.seed)
    }

  /** One partition's train + emit as a SINGLE one-task Spark job: the
    * task loads its bundle (data-local), trains, and writes its own
    * `embeddings_{tag}_{gid}_{pid}.csv` straight from the task —
    * exactly the reference client's topology (the client process trains
    * and writes its partition's CSV locally,
    * fl_client_unsupervised.py:117-122). No DataFrame round-trip, no
    * driver collect; the driver only coordinates.
    */
  private def trainAndEmitOne(spark: SparkSession, pid: String,
                              ref: BundleIO.BundleRef,
                              train: SageLinkModel => Unit,
                              hp: SageHyperParams, graphId: String,
                              tag: String, outDir: String): Unit = {
    val dim = hp.layerSizes._2
    val csv = s"$outDir/embeddings_${tag}_${graphId}_$pid.csv"
    spark.sparkContext.parallelize(Seq(ref), 1).foreach { r =>
      val model = SageLinkModel.fromRef(r, hp)
      train(model)
      // r.hadoopConf = the driver's conf, shipped inside the ref — the
      // task-direct write sees the same spark.hadoop.* settings
      GraphIO.writeEmbeddingsCsvFromTask(csv, dim,
        model.genEmbeddings(model.nodeIds).iterator, r.hadoopConf)
    }
  }

  /** Train + emit every partition (one task each, jobs submitted
    * concurrently from driver threads), then concat the CSVs.
    */
  private def emitEmbeddings(spark: SparkSession,
                             refs: Seq[(String, BundleIO.BundleRef)],
                             train: SageLinkModel => Unit,
                             hp: SageHyperParams, graphId: String, tag: String,
                             outDir: String): DataFrame = {
    graft.util.Par.mapAll(refs) { case (pid, ref) =>
      trainAndEmitOne(spark, pid, ref, train, hp, graphId, tag, outDir)
    }
    ConcatEmbeddings.run(spark, outDir, tag, graphId, refs.map(_._1),
      hp.layerSizes._2)
  }

  /** Zero-federation baseline. @return concatenated (id, embedding). */
  def run(spark: SparkSession, parts: Seq[(String, PropertyGraph)],
          graphId: String, epochs: Int, outDir: String,
          hp: SageHyperParams = SageHyperParams.unsupervised,
          walkLength: Int = SageHyperParams.unsupervisedWalkLength,
          nWalks: Int = SageHyperParams.unsupervisedNumWalks,
          logger: GraftLogger = GraftLogger.stdout()): DataFrame = {
    val t0 = System.nanoTime()
    // fused per-partition chains: a partition's training job starts the
    // moment ITS bundle is written, instead of barriering every
    // partition's ETL before any training starts — partitions are
    // independent, so there is nothing to wait for
    graft.util.Par.mapAll(parts) { case (pid, g) =>
      val ref = BundleIO.writeUnsupervised(spark, s"$outDir/bundles",
        s"${graphId}_$pid", g, walkLength, nWalks, hp.seed)
      trainAndEmitOne(spark, pid, ref,
        m => { m.initialize(); m.fit(epochs); () }, hp, graphId, "nograd", outDir)
    }
    val out = ConcatEmbeddings.run(spark, outDir, "nograd", graphId,
      parts.map(_._1), hp.layerSizes._2)
    logger.info(f"unsupervised nograd: trained ${parts.size} partitions, " +
      f"dim=${hp.layerSizes._2} (bundle+train+emit ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    out
  }

  /** Federated unsupervised training + embedding generation.
    * @return (federation result, concatenated (id, embedding))
    */
  def runFederated(spark: SparkSession, parts: Seq[(String, PropertyGraph)],
                   graphId: String, rounds: Int, epochs: Int, outDir: String,
                   hp: SageHyperParams = SageHyperParams.unsupervised,
                   walkLength: Int = SageHyperParams.unsupervisedWalkLength,
                   nWalks: Int = SageHyperParams.unsupervisedNumWalks,
                   logger: GraftLogger = GraftLogger.stdout()): (Federation.Result, DataFrame) = {
    val refs = writeBundles(spark, parts, graphId, outDir, hp, walkLength, nWalks)
    val init = new LocalGraphSage(hp, Map.empty, Map.empty,
      refs.head._2.numFeatures).initializeWeights()
    val result = Federation.run(spark, refs,
      (r: (String, BundleIO.BundleRef)) => SageLinkModel.fromRef(r._2, hp),
      init, rounds, epochs, graphId,
      weightsDir = Some(s"$outDir/weights"),
      unweighted = true, // A2: the unsupervised server's np.mean
      logger = logger)
    // every client runs the FINAL global encoder over its nodes
    val out = emitEmbeddings(spark, refs,
      m => m.setWeights(result.weights), hp, graphId, "fed", outDir)
    (result, out)
  }
}
