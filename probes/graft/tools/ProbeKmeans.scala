package graft.tools

import org.apache.spark.sql.SparkSession

/** Timing probe for Similarity.kmeansCentroids. */
object ProbeKmeans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    println(s"rows=${emb.count()}")
    for (iters <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      graft.llm.Similarity.kmeansCentroids(emb, 16, iters)
      println(f"kmeans iters=$iters: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
