package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object LakehouseLoopSpec {
  // top-level: Spark's product encoder cannot reach suite-inner classes
  final case class Rec(k: Long, v: Double)
}

/** The maintenance loop the three layout pieces exist for, welded end
  * to end: a streaming parquet sink accretes small unclustered files
  * (one-plus per micro-batch) → `Layout.compact` pays one bounded
  * rewrite with cluster columns → `Manifest.appendStats` maintains the
  * manifest over the rewritten files incrementally → `prunedRead`
  * returns exactly the rows the pre-compaction table held, now
  * skipping files. Each piece has its own spec (LayoutSpec,
  * ManifestSpec, streaming specs); this asserts the COMPOSITION: no
  * rows are lost or duplicated across the swap, and the manifest
  * maintained with appendStats over the new files — not a full
  * rebuild — prunes correctly.
  */
class LakehouseLoopSpec extends SparkSpec {
  import LakehouseLoopSpec.Rec
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq
  }

  test("stream-accreted small files -> compact -> appendStats manifest -> same rows, now prunable") {
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("lakeloop").toString
    val dir = base + "/t"
    val ckpt = base + "/ckpt"

    // 1. streaming sink accretes small files: 6 micro-batches of rows
    // whose keys interleave across batches, so every file spans ~the
    // whole key range and min/max pruning starts out useless
    val source = MemoryStream[Rec]
    val q = source.toDF().writeStream.format("parquet")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val rng = new scala.util.Random(13)
    (0 until 6).foreach { b =>
      source.addData((0 until 500).map(i => Rec(rng.nextInt(3000).toLong, b * 1000.0 + i)))
      q.processAllAvailable()
    }
    q.stop()

    val before = spark.read.parquet(dir).as[(Long, Double)].collect().sorted.toSeq
    val filesBefore = parquetFiles(dir)
    assert(filesBefore.size >= 6, s"expected one-plus file per batch, got ${filesBefore.size}")
    val m0 = Manifest.collectStats(spark, dir, Seq("k")).localCheckpoint()
    assert(Manifest.prune(m0, "k", lit(100L), lit(300L)).size === filesBefore.size,
      "interleaved stream layout: nothing prunable before compaction")

    // 2. one bounded rewrite, clustered on k
    val totalBytes = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
    }
    val stats = Layout.compact(spark, dir, targetBytes = math.max(totalBytes / 4, 1L),
      clusterCols = Seq("k"))
    assert(stats.filesAfter < stats.filesBefore)

    // 3. incremental manifest maintenance: drop the rewritten-away
    // files, append stats for the new ones (no history rescan)
    val filesAfter = parquetFiles(dir)
    val survivors = m0.filter(col("file").isin(filesAfter: _*))
    assert(survivors.count() === 0L, "compaction replaced every file")
    val m1 = Manifest.appendStats(spark, survivors, filesAfter, Seq("k"))
      .localCheckpoint()

    // 4. the loop closes: same rows, and the manifest now skips files
    val after = spark.read.parquet(dir).as[(Long, Double)].collect().sorted.toSeq
    assert(after === before, "compaction must not lose or duplicate rows")
    val surviving = Manifest.prune(m1, "k", lit(100L), lit(300L))
    assert(surviving.size < filesAfter.size,
      s"clustered rewrite must restore pruning: ${surviving.size}/${filesAfter.size}")
    val got = Manifest.prunedRead(spark, dir, m1, "k", lit(100L), lit(300L))
      .filter(col("k").between(100L, 300L)).as[(Long, Double)].collect().sorted.toSeq
    val want = before.filter { case (k, _) => k >= 100L && k <= 300L }
    assert(got === want)
  }
}
