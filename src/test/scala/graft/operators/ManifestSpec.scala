package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest: per-file stats correctness against a direct recompute,
  * the pruning-never-changes-the-answer contract, actual file skipping
  * on a clustered layout, null-stat safety, and the empty-survivor
  * edge.
  */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def writeClustered(n: Int, files: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    (1 to n).map(i => (i.toLong, s"v$i", i * 2.0)).toDF("k", "s", "v")
      .repartitionByRange(files, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("collectStats: one row per file, min/max match a direct recompute") {
    val dir = writeClustered(1000, 8)
    val m = Manifest.collectStats(spark, dir, Seq("k", "v")).collect()
    val nFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(m.length === nFiles)
    assert(m.map(_.getAs[Long]("n_rows")).sum === 1000L)
    // global extremes are the extremes of the per-file stats
    assert(m.map(_.getAs[Long]("min_k")).min === 1L)
    assert(m.map(_.getAs[Long]("max_k")).max === 1000L)
    assert(m.map(_.getAs[Double]("max_v")).max === 2000.0)
    // per-file: recompute one file's stats directly
    val f = m.head.getAs[String]("file")
    val direct = spark.read.parquet(dir)
      .filter(input_file_name() === f)
      .agg(min("k"), max("k")).as[(Long, Long)].head()
    assert((m.head.getAs[Long]("min_k"), m.head.getAs[Long]("max_k")) === direct)
  }

  test("prunedRead + residual filter equals the full scan, and skips files") {
    val dir = writeClustered(1000, 8)
    val m = Manifest.collectStats(spark, dir, Seq("k")).localCheckpoint()
    val lo = lit(200L); val hi = lit(320L)
    val survivors = Manifest.prune(m, "k", lo, hi)
    // the layout clusters k -> a 12% range must not touch all 8 files
    assert(survivors.nonEmpty && survivors.length < 8,
      s"expected pruning, got ${survivors.length}/8 files")
    val pruned = Manifest.prunedRead(spark, dir, m, "k", lo, hi)
      .filter(col("k").between(lo, hi))
      .select("k", "s", "v").as[(Long, String, Double)].collect().sortBy(_._1)
    val full = spark.read.parquet(dir)
      .filter(col("k").between(lo, hi))
      .select("k", "s", "v").as[(Long, String, Double)].collect().sortBy(_._1)
    assert(pruned === full)
    assert(pruned.length === 121)
  }

  test("files with null stats survive the prune (must be read)") {
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    // file of all-null k alongside a real file
    Seq((Option.empty[Long], "a"), (Option.empty[Long], "b")).toDF("k", "s")
      .coalesce(1).write.parquet(s"$dir/p1")
    Seq((Some(5L), "c")).toDF("k", "s").coalesce(1).write.parquet(s"$dir/p2")
    val both = spark.read.option("recursiveFileLookup", "true").parquet(dir)
    both.write.mode("overwrite").parquet(s"$dir/all")
    val m = Manifest.collectStats(spark, s"$dir/all", Seq("k"))
    // prune to a range missing k=5: the null-stat file must survive
    val survivors = Manifest.prune(m, "k", lit(100L), lit(200L))
    val nullFiles = m.filter(col("min_k").isNull).select("file")
      .as[String].collect().toSet
    assert(nullFiles.subsetOf(survivors.toSet),
      "no evidence is not evidence of absence")
  }

  test("appendStats over only the new batch equals a full rebuild") {
    val dir = writeClustered(500, 4)
    val before = spark.read.parquet(dir)
      .select(input_file_name()).distinct().as[String].collect().toSet
    val m0 = Manifest.collectStats(spark, dir, Seq("k")).localCheckpoint()
    // append a second batch of files to the same directory
    (501 to 800).map(i => (i.toLong, s"v$i", i * 2.0)).toDF("k", "s", "v")
      .repartitionByRange(2, col("k"))
      .sortWithinPartitions("k")
      .write.mode("append").parquet(dir)
    val after = spark.read.parquet(dir)
      .select(input_file_name()).distinct().as[String].collect().toSet
    val newFiles = (after -- before).toSeq
    assert(newFiles.nonEmpty)
    val incr = Manifest.appendStats(spark, m0, newFiles, Seq("k"))
    val full = Manifest.collectStats(spark, dir, Seq("k"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("file", "n_rows", "min_k", "max_k")
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(canon(incr) === canon(full))
    // and the maintained manifest prunes correctly over the grown table
    val survivors = Manifest.prune(incr, "k", lit(600L), lit(700L))
    assert(survivors.nonEmpty && survivors.toSet.subsetOf(after))
    val pruned = Manifest.prunedRead(spark, dir, incr, "k", lit(600L), lit(700L))
      .filter(col("k").between(600L, 700L)).count()
    assert(pruned === 101L)
  }

  test("empty survivor set returns an empty frame with the full schema") {
    val dir = writeClustered(100, 2)
    val m = Manifest.collectStats(spark, dir, Seq("k"))
    val out = Manifest.prunedRead(spark, dir, m, "k", lit(5000L), lit(6000L))
    assert(out.schema === spark.read.parquet(dir).schema)
    assert(out.count() === 0L)
  }
}
