package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.Similarity

/** Scratch probe: row counts + wall time of the non-SQL-expressible LLM
  * scale-path queries (q26–q28) on the real testdata tables.
  */
object ProbeLlm {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(16, "probe-llm")
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(n: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = n
      println(f"$name: $c rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    for (q <- Seq("q26_ann_ivf", "q27_minhash_neardup", "q28_simhash_neardup")) {
      time(q)(graft.SparkEntry.queries(q)(spark, dir).count())
    }
    val t = Tables(spark, dir)
    val emb = t.embeddings
    val probes = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, 5)
    println("LSH-ANN recall@5 vs exact: " + Similarity.recallAtK(
      exact, Similarity.lshTopK(emb, probes, 5)))
    println("LSH-ANN multiprobe recall@5: " + Similarity.recallAtK(
      exact, Similarity.lshTopK(emb, probes, 5, multiProbe = true)))
    spark.stop()
  }
}
