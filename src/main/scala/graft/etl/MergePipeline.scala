package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.GraphIO

/** The reference's canonical ETL pipeline (merge.py:14-47), Spark-first.
  *
  * Per partition: scan localstore edges/attributes and centralstore
  * (cut-edge) edges/attributes (S3), drop the trailing class label (S4),
  * cast (P2), union nodes with localstore-beats-centralstore priority and
  * keep-first dedup on id (A3, merge.py:38-39), union edges
  * (merge.py:40), write canonical node/edge CSVs (S7, merge.py:43-47).
  *
  * Scale: two distributed text scans + one window shuffle on `id` for
  * the dedup; edges are a pure union (no shuffle). At 100 TB the same
  * plan holds — the dedup shuffles only (id, priority, features-digest),
  * and AQE handles skewed ids.
  */
object MergePipeline {

  final case class MergedPartition(nodes: DataFrame, edges: DataFrame)

  /** Build the merged node/edge tables for one partition (lazy plans). */
  def merge(spark: SparkSession, localDir: String, centralDir: String,
            graphId: String, partitionId: String,
            nFeatures: Int = GraphIO.NumCoraFeatures): MergedPartition = {
    val nodesLocal   = GraphIO.readWhitespaceAttributes(
      spark, s"$localDir/${graphId}_attributes_$partitionId", nFeatures)
    val nodesCentral = GraphIO.readWhitespaceAttributes(
      spark, s"$centralDir/${graphId}_centralstore_attributes_$partitionId", nFeatures)
    val edgesLocal   = GraphIO.readWhitespaceEdges(
      spark, s"$localDir/${graphId}_$partitionId")
    val edgesCentral = GraphIO.readWhitespaceEdges(
      spark, s"$centralDir/${graphId}_centralstore_$partitionId")

    // merge.py:38-39: pd.concat order makes localstore win; ids are
    // unique within each store, so the only tie that matters is the
    // cross-store one — still, close the order with a deterministic
    // feature digest so the pick is total under any input.
    val nodes = Dedup.unionKeepFirst(
      Seq(nodesLocal, nodesCentral), Seq("id"),
      Seq(hash(col("features")).asc))

    // merge.py:40: plain concat, duplicates (cut edges present in both
    // stores) are KEPT — parity with ignore_index concat.
    val edges = edgesLocal.unionByName(edgesCentral)
    MergedPartition(nodes, edges)
  }

  /** Full merge.py parity run: merge + write canonical CSVs
    * `{dataDir}/{gid}_nodes_{pid}.csv` / `{gid}_edges_{pid}.csv`.
    */
  def run(spark: SparkSession, localDir: String, centralDir: String,
          dataDir: String, graphId: String, partitionId: String,
          nFeatures: Int = GraphIO.NumCoraFeatures): MergedPartition = {
    val m = merge(spark, localDir, centralDir, graphId, partitionId, nFeatures)
    GraphIO.writeNodesCsv(m.nodes, s"$dataDir/${graphId}_nodes_$partitionId.csv", nFeatures)
    GraphIO.writeEdgesCsv(m.edges, s"$dataDir/${graphId}_edges_$partitionId.csv")
    m
  }
}
