package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.Similarity

object ProfQ154 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "prof154")
    spark.sparkContext.setLogLevel("ERROR")
    val t = graft.Tables(spark, dir)
    val emb = t.embeddings
    val queries = emb.filter(col("vec_id") < 10)
    val cents = emb.filter(col("vec_id") < 16)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      val exact = time(s"rep$rep exact")(
        Similarity.bruteForceTopK(emb, queries, k = 5)
          .select(col("query_id"), col("neighbor_id")).localCheckpoint())
      val nQ = time(s"rep$rep nQ")(queries.count())
      val curve = time(s"rep$rep curve-build")(
        Similarity.ivfTopKCurve(emb, queries, cents, k = 5,
          nProbes = Seq(1, 2, 4, 8, 16), centroidIdCol = "vec_id"))
      time(s"rep$rep final")(
        curve.select(col("n_probe"), col("query_id"), col("neighbor_id"))
          .join(exact.withColumn("__hit", lit(1L)),
            Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("n_probe"))
          .agg(coalesce(sum(col("__hit")), lit(0L)).as("n_hits")).count())
    }
    spark.stop()
  }
}
