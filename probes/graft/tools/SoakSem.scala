package graft.tools

import org.apache.spark.sql.functions._

/** Scale soak of SemDeDup's PRODUCTION path (many learned cells over a
  * corpus 200× the fixture table) plus TF-IDF over a 10× documents dir:
  * the new-in-round-7 operators at their intended operating point
  * rather than the oracle-mode degeneracies the driver checks.
  *
  * SemDeDup corpus: `n` seeded synthetic 64-d vectors (hash-derived,
  * reproducible) + 1% planted near-dup twins (q34's perturbation
  * recipe, cosine ≈ 1). Reports wall time, pair counts, planted-twin
  * recall, and the plan's exchange counts — which must match the
  * sf0.1 shape (PLANS.md q60 row): a scale step changes volume, never
  * plan shape. Diagnostic main, not part of the driver contract.
  */
object SoakSem {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val docsDir = args.drop(1).headOption.getOrElse("/tmp/sf1soak")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, "soak-sem")
    spark.sparkContext.setLogLevel("WARN")

    // hash-derived unit-scale vectors: component d of row i is a
    // deterministic value in [-1, 1)
    val dim = 64
    val base = spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => (pmod(xxhash64(col("id"), j), lit(20001)) - 10000)
            .cast("double") / 10000.0).as("embedding"))
    val twins = base.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id"),
        transform(col("embedding"),
          (x, i) => x + lit(0.005) *
            (pmod(col("vec_id") + i.cast("bigint") + 1, lit(7)) - 3).cast("double"))
          .as("embedding"))
      .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(twins).localCheckpoint()
    val nPlanted = corpus.count() - n // materializes the corpus too

    val k = 256 // cells of ~n/k ≈ 400 rows: the SemDeDup operating point
    def pairs = graft.llm.Similarity.semanticPairs(corpus, tau = 0.9,
      k = k, iters = 2, trainFraction = 0.25)
    val plan = pairs.queryExecution.executedPlan.toString.split("\n")
    val broadcasts = plan.count(_.contains("BroadcastExchange"))
    val shuffles = plan.count(_.contains("Exchange")) - broadcasts
    val t0 = System.nanoTime()
    val found = pairs.localCheckpoint()
    val nPairs = found.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val caught = found
      .filter(col("id_b") === col("id_a") + 100000000L).count()
    println(f"SOAK semanticPairs n=${n + nPlanted} k=$k pairs=$nPairs " +
      f"planted=$nPlanted caught=$caught recall=${caught.toDouble / nPlanted}%.3f " +
      f"sec=$sec%.2f shuffles=$shuffles broadcasts=$broadcasts")

    // TF-IDF over the 10x documents dir, if present
    if (new java.io.File(s"$docsDir/documents.parquet").exists) {
      val fn = graft.SparkEntry.queries("q58_tfidf")
      val p2 = fn(spark, docsDir).queryExecution.executedPlan.toString.split("\n")
      val b2 = p2.count(_.contains("BroadcastExchange"))
      val s2 = p2.count(_.contains("Exchange")) - b2
      val t1 = System.nanoTime()
      val rows = fn(spark, docsDir).count()
      val sec2 = (System.nanoTime() - t1) / 1e9
      println(f"SOAK q58_tfidf rows=$rows sec=$sec2%.2f shuffles=$s2 broadcasts=$b2")
    } else {
      println(s"SOAK q58_tfidf skipped: $docsDir/documents.parquet absent")
    }
    spark.stop()
  }
}
