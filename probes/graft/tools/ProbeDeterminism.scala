package graft.tools

import java.security.MessageDigest

/** Diagnostic: isolate run-to-run nondeterminism in the supervised
  * session. Phase 1 runs the ETL (merge + double split + bundle write)
  * twice and hashes every bundle file two ways — order-sensitive (file
  * bytes in part order) and order-insensitive (sorted lines) — to
  * split "different example sets" from "same set, different order".
  * Phase 2 trains twice from the SAME bundle and compares metrics.
  */
object ProbeDeterminism {
  private def md5(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hashBundle(dir: String): Map[String, (String, String)] = {
    val base = new java.io.File(dir)
    base.listFiles().filter(_.isDirectory).map { sub =>
      val parts = sub.listFiles().filter(_.getName.startsWith("part-"))
        .sortBy(_.getName)
      val lines = parts.flatMap(f =>
        scala.io.Source.fromFile(f)("UTF-8").getLines().toVector)
      sub.getName -> (md5(lines.mkString("\n")), md5(lines.sorted.mkString("\n")))
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, app = "probe-det")
    spark.sparkContext.setLogLevel("WARN")
    try {
      // phase 1: ETL twice, compare bundle hashes
      val dirs = (1 to 2).map { i =>
        val out = java.nio.file.Files.createTempDirectory(s"det-etl$i").toString
        val m = graft.etl.MergePipeline.merge(spark, "/root/reference/data",
          "/root/reference/data", "4", "0")
        val g = graft.graph.PropertyGraph(m.nodes, m.edges).cache()
        graft.ml.BundleIO.write(spark, s"$out/bundles", "4_0", g)
        g.unpersist()
        s"$out/bundles/4_0"
      }
      val h1 = hashBundle(dirs(0)); val h2 = hashBundle(dirs(1))
      h1.keySet.union(h2.keySet).toSeq.sorted.foreach { k =>
        val (o1, s1) = h1.getOrElse(k, ("-", "-"))
        val (o2, s2) = h2.getOrElse(k, ("-", "-"))
        println(s"ETL $k orderEq=${o1 == o2} setEq=${s1 == s2}")
      }
      // phase 2: train twice from bundle 1
      val ref = graft.ml.BundleIO.BundleRef("4_0",
        dirs(0).stripSuffix("/4_0"), 1433)
      val hp = graft.ml.SageHyperParams()
      val aucs = (1 to 2).map { _ =>
        val model = graft.ml.SageLinkModel.fromRef(ref, hp)
        model.setWeights(new graft.ml.LocalGraphSage(hp, Map.empty, Map.empty,
          1433).initializeWeights())
        model.fit(2)
        model.evaluate()("test_auc")
      }
      println(s"TRAIN run1=${aucs(0)} run2=${aucs(1)} equal=${aucs(0) == aucs(1)}")
      // phase 3: full supervised session twice (concurrent ETL active)
      val sessions = (1 to 2).map { i =>
        val out = java.nio.file.Files.createTempDirectory(s"det-sess$i").toString
        graft.fed.FedTrain.runSession(spark, "/root/reference/data", "4",
          Seq("0", "1"), rounds = 3, epochs = 2, outDir = out)
          .result.finalMetrics.map { case (n, m) => n -> m }.toMap
      }
      println(s"SESSION equal=${sessions(0) == sessions(1)}")
    } finally spark.stop()
  }
}
