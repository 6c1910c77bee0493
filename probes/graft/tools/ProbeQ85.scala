package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.NearDup

/** Stage-level timing of q85's prefix-filter Jaccard join at a given
  * sf dir — finds where the wall time goes (shingle checkpoint, df
  * aggregate, prefix rebuild, candidate join, verify). Composes the
  * SAME package-private stage helpers `NearDup.prefixJaccardPairs`
  * runs (no copied pipeline to drift out of sync — ADVICE round-10).
  * Diagnostic main, not part of the driver contract.
  */
object ProbeQ85 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "probe-q85")
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, dir)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val twins = t.documents.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      substring(col("text"), lit(1), greatest(length(col("text")) - 10, lit(1))).as("text"))
    val corpus = t.documents.select(col("doc_id"), col("text")).unionByName(twins)

    val threshold = 0.6
    val sh = timed("shingle-checkpoint") {
      NearDup.prefixShingleSets(corpus, "doc_id", "text", shingleN = 3)
    }
    val ex = NearDup.prefixShingleExplode(sh)
    println(s"COUNT shingle-instances ${timed("explode-count")(ex.count())}")
    val gids = NearDup.prefixGidTable(ex)
    println(s"COUNT distinct-shingles ${timed("gid-table")(gids.count())}")
    val gidSets = timed("gidsets-checkpoint") {
      NearDup.prefixGidSets(NearDup.prefixInterned(ex, gids))
    }
    val prefix = NearDup.prefixRows(gidSets, threshold).localCheckpoint()
    println(s"COUNT prefix-rows ${timed("prefix-build")(prefix.count())}")
    val cand = timed("candidate-join") {
      NearDup.prefixCandidates(prefix, threshold)
    }
    println(s"COUNT candidates ${cand.count()}")
    val pairs = NearDup.prefixVerify(cand, gidSets, threshold)
    println(s"COUNT pairs ${timed("verify")(pairs.count())}")
    spark.stop()
  }
}
