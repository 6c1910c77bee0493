package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Graph fixture IO — SURVEY.md §2.1 S1–S8.
  *
  * The reference's catalog is string concatenation over CSV files
  * (fl_server.py:202-207, merge.py:14-29); this module reproduces each
  * scan/sink with explicit schemas (no inference scans) and carries node
  * features as one `ARRAY<FLOAT>` column internally — columnar-friendly
  * and what the graph layer wants — widening to the reference's 1434-col
  * layout only at the CSV sink boundary.
  *
  * Scale: all readers are ordinary distributed scans (text/CSV); nothing
  * collects. The single-file sinks exist for byte-parity with the
  * reference's pandas `to_csv` artifacts (fl_server.py reads exactly one
  * file per partition) and are documented as fixture-scale only — the
  * 100 TB path is the partitioned parquet/CSV directory writers.
  */
object GraphIO {

  val NumCoraFeatures = 1433

  /** S1 — canonical node CSV scan (`pd.read_csv(path, index_col=0)`,
    * fl_server.py:202-203). Header `0,1,...,n`; col 0 = node id.
    * Returns `(id LONG, features ARRAY<FLOAT>)`.
    */
  def readNodesCsv(spark: SparkSession, path: String,
                   nFeatures: Int = NumCoraFeatures): DataFrame = {
    val schema = StructType(
      StructField("0", LongType, nullable = false) +:
        (1 to nFeatures).map(i => StructField(i.toString, FloatType, nullable = false)))
    spark.read.schema(schema).option("header", "true").csv(path)
      .select(col("0").as("id"),
        array((1 to nFeatures).map(i => col(i.toString)): _*).as("features"))
  }

  /** S2 — canonical edge CSV scan (header `source,target`,
    * fl_server.py:206-207). Returns `(source LONG, target LONG)`.
    */
  def readEdgesCsv(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("source", LongType, nullable = false),
      StructField("target", LongType, nullable = false)))
    spark.read.schema(schema).option("header", "true").csv(path)
  }

  /** S3+S6 — headerless whitespace-separated edge scan
    * (`pd.read_csv(p, sep='\s+', header=None)` + positional rename,
    * merge.py:18-20,27-29). `\s+` is not a CSV delimiter, so read as
    * text and split — a distributed projection, not a datasource.
    * Cast LONG (safe superset of the reference's uint32, merge.py:32-33).
    */
  def readWhitespaceEdges(spark: SparkSession, path: String): DataFrame = {
    // \S+ extraction, not trim+split: pandas' sep='\s+' skips leading
    // whitespace of ANY kind, while Spark's trim strips only 0x20 — a
    // leading tab produced a phantom "" token shifting every column
    val toks = regexp_extract_all(col("value"), lit("\\S+"), lit(0))
    spark.read.text(path)
      .filter(col("value").rlike("\\S"))
      .select(
        toks.getItem(0).cast(LongType).as("source"),
        toks.getItem(1).cast(LongType).as("target"))
  }

  /** S3+S4+P2 — headerless whitespace/tab attribute scan with
    * column-range projection: keep id + `nFeatures` features, DROP the
    * trailing class-label column (`.loc[:,0:1433]`, merge.py:15,24),
    * cast features float32 (merge.py:34-35).
    * Returns `(id LONG, features ARRAY<FLOAT>)`.
    */
  def readWhitespaceAttributes(spark: SparkSession, path: String,
                               nFeatures: Int = NumCoraFeatures): DataFrame = {
    val toks = regexp_extract_all(col("value"), lit("\\S+"), lit(0))
    spark.read.text(path)
      .filter(col("value").rlike("\\S"))
      .select(
        toks.getItem(0).cast(LongType).as("id"),
        // tokens 1..nFeatures; slice() is 1-based, so start=2
        slice(toks, 2, nFeatures).cast(ArrayType(FloatType)).as("features"))
  }

  /** Same scan keeping the label column — used by supervised paths that
    * need the class (the reference drops it in merge but reads it in
    * misc/model.py:95-99's full-table variant).
    */
  def readWhitespaceAttributesWithLabel(spark: SparkSession, path: String,
                                        nFeatures: Int = NumCoraFeatures): DataFrame = {
    val toks = regexp_extract_all(col("value"), lit("\\S+"), lit(0))
    spark.read.text(path)
      .filter(col("value").rlike("\\S"))
      .select(
        toks.getItem(0).cast(LongType).as("id"),
        slice(toks, 2, nFeatures).cast(ArrayType(FloatType)).as("features"),
        toks.getItem(nFeatures + 1).as("label"))
  }

  /** S7 — canonical node CSV sink (`nodes.to_csv(p)`, merge.py:46).
    * Widens `features ARRAY<FLOAT>` back to the reference's header
    * `0,1,...,n` (id column named `0`, pandas index-name parity).
    * Single file for fixture parity.
    */
  def writeNodesCsv(nodes: DataFrame, path: String,
                    nFeatures: Int = NumCoraFeatures): Unit = {
    val wide = nodes.select(
      col("id").as("0") +:
        (1 to nFeatures).map(i => col("features").getItem(i - 1).as(i.toString)): _*)
    writeSingleCsv(wide, path, header = true)
  }

  /** S7 — canonical edge CSV sink (`edges.to_csv(p, index=False)`,
    * merge.py:47). Header `source,target`, single file.
    */
  def writeEdgesCsv(edges: DataFrame, path: String): Unit =
    writeSingleCsv(edges.select(col("source"), col("target")), path, header = true)

  /** S8 — embedding CSV sink (`emb.to_csv(path)` with a nameless index,
    * fl_client_unsupervised.py:121-122, concat_embeddings.py:27-28).
    * pandas writes header `,0,1,...,d-1` (leading empty cell for the
    * index), which is not a legal Spark column name — so the header line
    * is streamed in explicitly.
    */
  def writeEmbeddingsCsv(emb: DataFrame, path: String, dim: Int): Unit = {
    val wide = emb.select(
      col("id") +:
        (0 until dim).map(i => col("embedding").getItem(i).as(i.toString)): _*)
    writeSingleCsv(wide, path, header = false,
      headerOverride = Some(("" +: (0 until dim).map(_.toString)).mkString(",")))
  }

  /** Task-side twin of [[writeEmbeddingsCsv]]: the reference CLIENT
    * writes its own partition's embeddings from inside the client
    * process (fl_client_unsupervised.py:117-122) — this is the same
    * topology: the training task streams its rows straight to storage
    * with no DataFrame round-trip and no driver involvement. Identical
    * file shape (pandas header `,0..d-1`; `Float.toString` values, the
    * rendering Spark's CSV writer uses for FloatType). Works on any
    * Hadoop-compatible FS: `conf` must be the DRIVER's Hadoop conf
    * (shipped via [[graft.util.SerializableHadoopConf]]) so
    * `spark.hadoop.*` settings — object-store credentials, defaultFS —
    * reach the task.
    *
    * Commit protocol: the stream targets an attempt-unique temp file,
    * renamed over `path` only after a complete write — a task retry or
    * speculative twin can never interleave with or truncate a reader's
    * view; whichever complete attempt renames last wins.
    */
  def writeEmbeddingsCsvFromTask(path: String, dim: Int,
                                 rows: Iterator[(Long, Array[Float])],
                                 conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(tc => s"${tc.stageAttemptNumber}-${tc.taskAttemptId}")
      .getOrElse(java.util.UUID.randomUUID().toString)
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.$attempt.inprogress")
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(tmp, true), "UTF-8"), 1 << 16)
    try {
      try {
        out.write(("" +: (0 until dim).map(_.toString)).mkString(","))
        out.write("\n")
        rows.foreach { case (id, vec) =>
          out.write(id.toString)
          var i = 0
          while (i < dim) { out.write(","); out.write(vec(i).toString); i += 1 }
          out.write("\n")
        }
      } finally out.close()
    } catch {
      case t: Throwable =>
        // don't orphan the attempt file: a killed/failed attempt left
        // `.name.attempt.inprogress` junk accumulating per retry
        try fs.delete(tmp, false)
        catch { case _: Throwable => () }
        throw t
    }
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      // a concurrent complete attempt committed first — fine; anything
      // else is a real FS failure the caller must see
      require(fs.exists(p),
        s"writeEmbeddingsCsvFromTask: commit rename $tmp -> $p failed")
    }
  }

  /** Embedding CSV scan (concat_embeddings.py:14-17): header
    * `,0,...,d-1`, first column = node id. Explicit schema (header row
    * skipped). Returns `(id LONG, embedding ARRAY<FLOAT>)`.
    */
  def readEmbeddingsCsv(spark: SparkSession, path: String, dim: Int): DataFrame = {
    val schema = StructType(
      StructField("id", LongType, nullable = false) +:
        (0 until dim).map(i => StructField(s"e$i", FloatType, nullable = false)))
    spark.read.schema(schema).option("header", "true").csv(path)
      .select(col("id"),
        array((0 until dim).map(i => col(s"e$i")): _*).as("embedding"))
  }

  /** Scale-path sink: partitioned CSV directory (no coalesce). Use this
    * instead of the single-file writers for anything non-fixture-sized.
    */
  def writeCsvDir(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)

  /** The long-term catalog (SURVEY §1.4): graphs as PARTITIONED PARQUET
    * under `root/{nodes,edges}/graph_id=G/partition_id=P/` — columnar,
    * schema-embedded, partition-pruned reads (asking for one graph
    * partition scans only its directory). The CSV writers above exist
    * for fixture parity; this is what a 100 TB deployment stores.
    */
  def writeGraphParquet(nodes: DataFrame, edges: DataFrame, root: String,
                        graphId: String, partitionId: String): Unit = {
    import org.apache.spark.sql.functions.lit
    // dynamic overwrite: replace only this (graph, partition) directory,
    // never sibling partitions already in the catalog
    nodes.withColumn("graph_id", lit(graphId))
      .withColumn("partition_id", lit(partitionId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("graph_id", "partition_id")
      .parquet(s"$root/nodes")
    edges.withColumn("graph_id", lit(graphId))
      .withColumn("partition_id", lit(partitionId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("graph_id", "partition_id")
      .parquet(s"$root/edges")
  }

  /** Read one graph partition from the parquet catalog — the
    * graph_id/partition_id filters prune to a single directory pair
    * (verify with PushedFilters/partition pruning in the plan).
    */
  def readGraphParquet(spark: SparkSession, root: String,
                       graphId: String, partitionId: String): (DataFrame, DataFrame) = {
    def part(sub: String) = spark.read.parquet(s"$root/$sub")
      .filter(col("graph_id") === graphId && col("partition_id") === partitionId)
      .drop("graph_id", "partition_id")
    (part("nodes"), part("edges"))
  }

  /** Write a DataFrame as exactly one CSV file at `path` (pandas
    * `to_csv` parity). Coalesces to a single task — fixture-scale only.
    */
  private[graft] def writeSingleCsv(df: DataFrame, path: String, header: Boolean,
                                    headerOverride: Option[String] = None): Unit = {
    val spark = df.sparkSession
    val tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").option("header", header.toString).csv(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(tmp).resolve("."), conf)
    try {
      val parts = fs.globStatus(new Path(tmp, "part-*"))
      require(parts != null && parts.nonEmpty,
        s"writeSingleCsv: the coalesced write produced no part file under " +
          s"$tmp (zero-partition input?)")
      val part = parts(0).getPath
      val dest = new Path(path)
      if (fs.exists(dest)) fs.delete(dest, false)
      headerOverride match {
        case None =>
          // rename returns false (not an exception) on several FS
          // boundaries — an unchecked false silently committed nothing
          require(fs.rename(part, dest),
            s"writeSingleCsv: commit rename $part -> $dest failed")
        case Some(h) =>
          // stitch inside the temp dir, then ONE atomic rename to the
          // committed name — a mid-copy failure must never leave a
          // truncated file where a reader expects a complete artifact
          val stitched = new Path(tmp, "stitched.csv")
          val out = fs.create(stitched, true)
          try {
            out.write((h + "\n").getBytes("UTF-8"))
            val in = fs.open(part)
            try org.apache.hadoop.io.IOUtils.copyBytes(in, out, conf, false)
            finally in.close()
          } finally out.close()
          require(fs.rename(stitched, dest),
            s"writeSingleCsv: commit rename $stitched -> $dest failed")
      }
    } finally fs.delete(new Path(tmp), true)
  }
}
