package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.GraphIO

/** concat_embeddings.py:12-28 parity: union per-partition embedding
  * tables in partition order and keep the FIRST occurrence of each node
  * id (nodes replicated across partitions via cut-edges appear once,
  * lower partition id wins).
  */
object ConcatEmbeddings {

  /** Relational core, reusable over any `(id, embedding)` frames. */
  def concat(parts: Seq[DataFrame]): DataFrame =
    Dedup.unionKeepFirst(parts, Seq("id"), Seq(hash(col("embedding")).asc))

  /** File-level parity: read `embeddings_{tag}_{gid}_{pid}.csv` for each
    * partition, concat, write `embeddings_{tag}_{gid}.csv`
    * (concat_embeddings.py:25-28).
    */
  def run(spark: SparkSession, dir: String, tag: String, graphId: String,
          partitionIds: Seq[String], dim: Int): DataFrame = {
    val parts = partitionIds.map { pid =>
      GraphIO.readEmbeddingsCsv(spark, s"$dir/embeddings_${tag}_${graphId}_$pid.csv", dim)
    }
    val out = concat(parts)
    GraphIO.writeEmbeddingsCsv(out, s"$dir/embeddings_${tag}_$graphId.csv", dim)
    out
  }
}
