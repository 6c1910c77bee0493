package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.fed.FedTrain
import graft.ml.UnsupervisedPipeline
import graft.etl.MergePipeline
import graft.graph.PropertyGraph

/** Self-measured reference-parity numbers (BASELINE.md "Targets": record
  * wall-clock for R=3 rounds, 2-way CORA, supervised defaults;
  * embedding-gen nodes/sec; compare releases against ourselves).
  *
  * Appends one row per invocation to PARITY.md so the numbers track
  * release-over-release:
  *
  *   runMain graft.tools.Parity [label] [storeDir] [outMd]
  */
object Parity {
  def main(args: Array[String]): Unit = {
    val label = args.lift(0).getOrElse("dev")
    val storeDir = args.lift(1).getOrElse("/root/reference/data")
    val outMd = args.lift(2).getOrElse("PARITY.md")
    val work = Files.createTempDirectory("graft-parity").toString
    val spark = graft.GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, app = "graft-parity")
    spark.sparkContext.setLogLevel("WARN")
    try {
      // --- supervised: the reference README's canonical run shape —
      // graph 4 split 2 ways, 3 federated rounds, 2 local epochs ---
      val t0 = System.nanoTime()
      val sup = FedTrain.runSession(spark, storeDir, "4", Seq("0", "1"),
        rounds = 3, epochs = 2, outDir = s"$work/sup")
      val supSecs = (System.nanoTime() - t0) / 1e9
      val aucs = sup.result.finalMetrics.flatMap(_._2.get("test_auc"))
      val meanAuc = if (aucs.nonEmpty) aucs.sum / aucs.size else Double.NaN

      // --- unsupervised embedding generation (nograd variant): train
      // per partition, emit every node's embedding, concat ---
      val parts = Seq("0", "1").map { pid =>
        val m = MergePipeline.merge(spark, storeDir, storeDir, "4", pid)
        pid -> PropertyGraph(m.nodes, m.edges).cache()
      }
      val t1 = System.nanoTime()
      val emb = UnsupervisedPipeline.run(spark, parts, "4", epochs = 2,
        outDir = s"$work/unsup")
      val nNodes = emb.count()
      val unsupSecs = (System.nanoTime() - t1) / 1e9
      val nodesPerSec = nNodes / unsupSecs

      val header =
        """# PARITY — self-measured reference-parity numbers
          |
          |The reference publishes no timings (BASELINE.md: "Timing
          |instrumentation (no published values)"), so these track OUR
          |releases against ourselves on the reference's own fixtures:
          |2-way CORA (graph 4, partitions 0,1), supervised R=3 rounds ×
          |2 epochs, unsupervised-nograd embedding generation × 2 epochs.
          |Regenerate with `sbt "runMain graft.tools.Parity <label>"`.
          |
          |The embed columns time the full unsupervised pipeline (walk
          |sampling + 2-epoch training + embedding emission + CSV concat),
          |matching what the reference's unsupervised session does.
          |
          || label | supervised R=3 wall (s) | mean test AUC | embed nodes | embed wall (s) | embed nodes/s |
          ||---|---|---|---|---|---|
          |""".stripMargin
      val row = f"| $label | $supSecs%.1f | $meanAuc%.4f | $nNodes | $unsupSecs%.1f | $nodesPerSec%.0f |"
      val path = Paths.get(outMd)
      if (!Files.exists(path)) Files.write(path, header.getBytes("UTF-8"))
      // insert after the LAST table row, not at EOF — the file carries
      // prose below the table and a blind append lands outside it
      val lines = scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(path)).asScala.toVector
      val lastRow = lines.lastIndexWhere(_.startsWith("| "))
      val updated =
        if (lastRow < 0) lines :+ row
        else (lines.take(lastRow + 1) :+ row) ++ lines.drop(lastRow + 1)
      Files.write(path, updated.mkString("", "\n", "\n").getBytes("UTF-8"),
        StandardOpenOption.TRUNCATE_EXISTING)
      println(s"PARITY $label supervised=${supSecs}s auc=$meanAuc " +
        s"embed=$nNodes nodes in ${unsupSecs}s (${nodesPerSec.toLong}/s) -> $outMd")
    } finally spark.stop()
  }
}
