package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.NearDup

/** One-off tuning probe for q27's oracle equality: for several
  * (numHashes, bands) settings, compare LSH near-dup output against the
  * exact all-pairs Jaccard ≥ 0.6 set on the q27 corpus at a given sf
  * dir, and report misses + candidate-join cost.
  */
object ProbeQ27 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val twins = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      substring(col("text"), lit(1), greatest(length(col("text")) - 10, lit(1))).as("text"))
    val corpus = docs.select(col("doc_id"), col("text")).unionByName(twins).cache()
    corpus.count()
    val exactOpt = if (sys.env.get("PROBE_SKIP_EXACT").isEmpty) {
      val e = NearDup.exactJaccardPairs(corpus, "doc_id", "text", 0.6, 3)
        .select("id_a", "id_b").cache()
      println(s"exact pairs >= 0.6: ${e.count()}")
      Some(e)
    } else None
    for ((nh, b) <- Seq((64, 16), (48, 16), (96, 24), (64, 32), (128, 32))) {
      val t0 = System.nanoTime()
      val cands = NearDup.candidatePairs(corpus, "doc_id", "text", 3, nh, b).cache()
      val nCands = cands.count()
      val found = NearDup.nearDupPairs(corpus, "doc_id", "text", 0.6, 3, nh, b)
        .select("id_a", "id_b").cache()
      val nFound = found.count()
      val missed = exactOpt.map(_.join(found, Seq("id_a", "id_b"), "left_anti").collect())
        .getOrElse(Array.empty[org.apache.spark.sql.Row])
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"hashes=$nh%4d bands=$b%3d rows=${nh / b}%2d: cands=$nCands%8d " +
        f"found=$nFound%6d missed=${missed.length}%3d time=$secs%6.2fs " +
        missed.take(5).mkString(" "))
      cands.unpersist(); found.unpersist()
    }
    spark.stop()
  }
}
