package graft.tools

import org.apache.spark.sql.functions._
import graft.llm.{NearDup, TextOps}

/** Stage-level timing of q85's prefix-filter Jaccard join at a given
  * sf dir — finds where the wall time goes (shingle checkpoint, df
  * aggregate, prefix rebuild, candidate join, verify). Diagnostic
  * main, not part of the driver contract.
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
      corpus.select(col("doc_id").as("__sid"),
          array_distinct(TextOps.wordShingles(col("text"), 3)).as("__sh"))
        .filter(size(col("__sh")) > 0)
        .localCheckpoint()
    }
    val ex = sh.select(col("__sid"), size(col("__sh")).as("__n"),
      explode(col("__sh")).as("__g"))
    println(s"COUNT shingle-instances ${timed("explode-count")(ex.count())}")
    val dfreq = ex.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    println(s"COUNT distinct-shingles ${timed("dfreq-count")(dfreq.count())}")
    val pLen = (col("__n") - ceil(lit(threshold) * col("__n") - lit(1e-9)) + 1).cast("int")
    val prefix = ex.join(dfreq, Seq("__g"))
      .groupBy(col("__sid"), col("__n"))
      .agg(sort_array(collect_list(struct(col("__df"), col("__g")))).as("__ord"))
      .select(col("__sid"), col("__n"),
        posexplode(slice(transform(col("__ord"), s => s.getField("__g")),
          lit(1), pLen)))
      .select(col("__sid"), col("__n"), (col("pos") + 1).as("__p"), col("col").as("__g"))
      .localCheckpoint()
    println(s"COUNT prefix-rows ${timed("prefix-build")(prefix.count())}")
    val minOverlap = ceil(
      lit(threshold / (1.0 + threshold)) * (col("l.__n") + col("r.__n")) - lit(1e-9))
    val cand = prefix.as("l")
      .join(prefix.as("r"),
        col("l.__g") === col("r.__g") && col("l.__sid") < col("r.__sid")
          && least(col("l.__n"), col("r.__n")).cast("double") >=
             lit(threshold) * greatest(col("l.__n"), col("r.__n")).cast("double")
          && (lit(1L) + least(col("l.__n") - col("l.__p"), col("r.__n") - col("r.__p")))
             >= minOverlap)
      .select(col("l.__sid").as("id_a"), col("r.__sid").as("id_b"))
      .distinct()
      .localCheckpoint()
    println(s"COUNT candidates ${timed("candidate-join")(cand.count())}")
    val exk = sh.select(col("__sid"), explode(col("__sh")).as("__g"))
    val nMap = sh.select(col("__sid"), size(col("__sh")).as("__nn"))
    val pairs = cand
      .join(exk.withColumnRenamed("__sid", "id_a"), Seq("id_a"))
      .join(exk.withColumnRenamed("__sid", "id_b"), Seq("id_b", "__g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__i"))
      .join(nMap.select(col("__sid").as("id_a"), col("__nn").as("__na")), Seq("id_a"))
      .join(nMap.select(col("__sid").as("id_b"), col("__nn").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") /
          (col("__na") + col("__nb") - col("__i")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    println(s"COUNT pairs ${timed("verify")(pairs.count())}")
    spark.stop()
  }
}
