package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.fed.FedAvg.Weights
import graft.fed.FedModel
import graft.graph.{EdgeSplitter, PropertyGraph}

/** A serializable per-partition training bundle — everything one
  * federated client needs, materialized once by Spark ETL on the driver
  * and shipped to the training task (the reference client loads the
  * same data from its local CSVs, fl_client.py:194-208).
  *
  * Scale: a bundle is one graph PARTITION, which fits in task memory by
  * the system's own design (mem.py's admission model; the shed variant
  * exists precisely to keep it that way). At cluster scale bundles
  * would be written per-partition to parquet and loaded task-side;
  * shipping through the closure is the local[*] equivalent.
  */
final case class PartitionBundle(
    name: String,
    features: Map[Long, Array[Float]],
    adjacency: Map[Long, Array[Long]],
    trainExamples: Array[(Long, Long, Int)],
    testExamples: Array[(Long, Long, Int)],
    numFeatures: Int) extends Serializable

object PartitionBundle {

  /** Build a bundle from a PropertyGraph with the reference's double
    * split (models/supervised.py:67-77): test p=0.1 off the full graph,
    * train p=0.1 off the residual; samplers see only the train-residual
    * graph's adjacency.
    */
  def fromGraph(spark: SparkSession, name: String, g: PropertyGraph,
                testP: Double = 0.1, trainP: Double = 0.1,
                seed: Long = 42L): PartitionBundle = {
    import spark.implicits._
    val testSplit = EdgeSplitter.trainTestSplit(g, testP, seed)
    val trainSplit = EdgeSplitter.trainTestSplit(testSplit.residual, trainP, seed + 1)
    val feats = g.nodes.select(col("id"), col("features"))
      .as[(Long, Array[Float])].collect().toMap
    val adj = trainSplit.residual.adjacency()
      .as[(Long, Array[Long])].collect().toMap
    val train = trainSplit.examples.select("source", "target", "label")
      .as[(Long, Long, Int)].collect()
    val test = testSplit.examples.select("source", "target", "label")
      .as[(Long, Long, Int)].collect()
    val nF = feats.headOption.map(_._2.length).getOrElse(0)
    PartitionBundle(name, feats, adj, train, test, nF)
  }
}

/** The supervised federated client (fl_client.py semantics): GraphSAGE
  * link prediction over one partition bundle. `numExamples` is the
  * train-example count the server weighs FedAvg with (A4,
  * fl_client.py:204-208).
  */
final class SageLinkModel(bundle: PartitionBundle, hp: SageHyperParams)
    extends FedModel {

  private val sage = new LocalGraphSage(hp, bundle.features, bundle.adjacency,
    bundle.numFeatures)

  def initialize(): Weights = sage.initializeWeights()
  def numExamples: Long = bundle.trainExamples.length.toLong
  def getWeights: Weights = sage.getWeights
  def setWeights(w: Weights): Unit = sage.setWeights(w)
  def fit(epochs: Int): Weights = {
    sage.fit(bundle.trainExamples, epochs)
    sage.getWeights
  }
  def evaluate(): Map[String, Double] = {
    val train = sage.evaluate(bundle.trainExamples).map { case (k, v) => s"train_$k" -> v }
    val test = sage.evaluate(bundle.testExamples).map { case (k, v) => s"test_$k" -> v }
    train ++ test
  }
  def genEmbeddings(nodes: Array[Long]): Array[(Long, Array[Float])] =
    sage.genEmbeddings(nodes)
}
