package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.llm.TextOps

/** Scratch probe for the q25 bench outlier (not part of the driver
  * contract; run via `runMain graft.tools.ProbeQ25 <sfDir>`).
  */
object ProbeQ25 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "probe")
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)

    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // (a) current: 4 independent shingle expression trees
    val sh = TextOps.wordShingles(col("text"), 3)
    time("a_current") {
      t.documents.select(col("doc_id"), size(sh).as("n_shingles"),
        size(array_distinct(sh)).as("n_distinct"),
        TextOps.repetitionScore(col("text"), 3).as("repetition"))
    }

    // (b) two-stage: shingles once, counts from the alias
    time("b_shared_shingles") {
      t.documents.select(col("doc_id"), sh.as("__sh"))
        .select(col("doc_id"), size(col("__sh")).as("n_shingles"),
          size(array_distinct(col("__sh"))).as("n_distinct"))
        .withColumn("repetition",
          when(col("n_shingles") === 0, lit(0.0))
            .otherwise(lit(1.0) - col("n_distinct").cast("double")
              / col("n_shingles").cast("double")))
    }

    // (c) is it the tokenizer? raw split only
    time("c_split_only") {
      t.documents.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n"))
    }

    // (d) shingles once, no distinct
    time("d_shingles_nodistinct") {
      t.documents.select(col("doc_id"), size(sh).as("n"))
    }

    // (e) distinct only, one tree
    time("e_distinct_once") {
      t.documents.select(col("doc_id"), size(array_distinct(sh)).as("n"))
    }
    spark.stop()
  }
}
