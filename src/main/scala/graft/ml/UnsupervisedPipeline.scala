package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.ConcatEmbeddings
import graft.graph.PropertyGraph
import graft.sources.{GraftLogger, GraphIO}

/** The zero-federation unsupervised producer
  * (distributed_nograd.py:19-34 + fl_client_unsupervised.py:117-122
  * parity): per partition, train an unsupervised GraphSAGE on the
  * walk-pair corpus, run the encoder over EVERY node, write
  * `embeddings_nograd_{gid}_{pid}.csv`; then the concat job unions and
  * keep-first-dedups the per-partition tables into
  * `embeddings_nograd_{gid}.csv` (concat_embeddings.py:12-28 — the
  * consumer half already lives in ConcatEmbeddings).
  *
  * Execution shape: one Spark task per partition — the task loads its
  * bundle (data-local), trains, and EMITS the embedding rows as RDD
  * output; embeddings flow task → CSV sink as a DataFrame, never
  * through a driver collect. Training is independent per partition
  * (that is the point of the nograd baseline), so the job is
  * embarrassingly parallel.
  */
object UnsupervisedPipeline {

  /** @param parts (partitionId, graph) pairs
    * @return the concatenated embedding table (id, embedding)
    */
  def run(spark: SparkSession, parts: Seq[(String, PropertyGraph)],
          graphId: String, epochs: Int, outDir: String,
          hp: SageHyperParams = SageHyperParams.unsupervised,
          walkLength: Int = SageHyperParams.unsupervisedWalkLength,
          nWalks: Int = SageHyperParams.unsupervisedNumWalks,
          logger: GraftLogger = GraftLogger.stdout()): DataFrame = {
    import spark.implicits._
    val dim = hp.layerSizes._2

    // 1. per-partition bundles: features + full-graph adjacency + walk
    //    pairs (all distributed writes)
    val refs = parts.map { case (pid, g) =>
      pid -> BundleIO.writeUnsupervised(spark, s"$outDir/bundles",
        s"${graphId}_$pid", g, walkLength, nWalks, hp.seed)
    }

    // 2. one training task per partition; embeddings come back as rows
    val embRows = spark.sparkContext
      .parallelize(refs, refs.size)
      .flatMap { case (pid, ref) =>
        val model = SageLinkModel.fromRef(ref, hp)
        model.initialize()
        model.fit(epochs)
        model.genEmbeddings(model.nodeIds).iterator
          .map { case (id, vec) => (pid, id, vec) }
      }
      .toDF("pid", "id", "embedding")
      .cache()
    embRows.count() // train all partitions once, before the per-pid writes

    // 3. per-partition CSV artifacts (S8 naming,
    //    distributed_nograd.py:33-34), then the concat/dedup consumer
    refs.foreach { case (pid, _) =>
      GraphIO.writeEmbeddingsCsv(
        embRows.filter($"pid" === pid).select($"id", $"embedding"),
        s"$outDir/embeddings_nograd_${graphId}_$pid.csv", dim)
    }
    logger.info(s"unsupervised nograd: trained ${refs.size} partitions, dim=$dim")
    val out = ConcatEmbeddings.run(spark, outDir, "nograd", graphId,
      refs.map(_._1), dim)
    embRows.unpersist()
    out
  }
}
