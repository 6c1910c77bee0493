package graft.ml

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{EdgeSplitter, PropertyGraph}

/** Storage-backed partition bundles: the driver never materializes a
  * partition's data.
  *
  * `write` runs the double edge split and DISTRIBUTED Spark text writes
  * of features / adjacency / train / test under `dir/name/` — the only
  * thing that returns to the driver is a `BundleRef` (paths + feature
  * count). `load` runs INSIDE an executor task (plain Hadoop FS reads,
  * no SparkSession) and builds the in-memory `PartitionBundle` the
  * trainer owns — the same topology as the reference, where each client
  * process reads its own partition's CSVs locally
  * (fl_client.py:194-208).
  *
  * Scale: each sub-table is a partitioned text directory (no
  * coalesce-to-1); a bundle is one graph PARTITION, sized to fit one
  * task by the system's own admission model (mem.py), so the task-side
  * load is bounded by design. Works on any Hadoop-compatible FS (local,
  * HDFS, S3A) — on a 1000-executor cluster the loads are data-local
  * reads with zero driver involvement.
  */
object BundleIO {

  /** Everything the driver holds for one partition. Carries the
    * session's Hadoop conf (serializable wrapper) so the TASK-side
    * `load` resolves the bundle paths with the driver's `spark.hadoop.*`
    * settings — credentials, defaultFS — instead of a blank
    * `Configuration`; `null` (probe tooling) falls back to the blank
    * conf, which is correct only on a plain local FS.
    */
  final case class BundleRef(name: String, dir: String, numFeatures: Int,
                             hconf: graft.util.SerializableHadoopConf = null)
      extends Serializable {
    override def toString: String = name
    def hadoopConf: Configuration =
      if (hconf == null) new Configuration() else hconf.value
  }

  /** Split + persist one partition's training bundle; returns its ref.
    * Layout: `dir/name/{features,adjacency,train,test}/part-*` —
    * space-separated text: `id f…` / `id nbr…` / `src dst label`.
    */
  /** @param maxDegree adjacency cap per node (deterministic smallest
    *   ids win) — REQUIRED at web-graph scale to bound hub-node array
    *   size in both storage and trainer memory; unbounded for fixtures.
    */
  def write(spark: SparkSession, dir: String, name: String, g: PropertyGraph,
            testP: Double = 0.1, trainP: Double = 0.1,
            seed: Long = 42L, maxDegree: Int = Int.MaxValue): BundleRef = {
    val testSplit = EdgeSplitter.trainTestSplit(g, testP, seed)
    val trainSplit = EdgeSplitter.trainTestSplit(testSplit.residual, trainP, seed + 1)
    val base = s"$dir/$name"
    // Every sub-table is written in CANONICAL (sorted) order: the
    // split's example SET is seeded-deterministic, but its row order
    // reflects plan internals (partition boundaries, aggregate
    // iteration) that shift between runs — and the trainer's seeded
    // epoch shuffle permutes the LOADED order, so an order change is a
    // training-dynamics change (measured: same example set, different
    // AUC run to run). A global sort pins it; range-partitioned sorted
    // part files concatenate to the total order however the partition
    // boundaries fall, at the cost of one bounded ETL-time shuffle.
    g.nodes.orderBy("id")
      .select(concat_ws(" ", col("id"), col("features").cast("array<string>")))
      .write.mode("overwrite").text(s"$base/features")
    trainSplit.residual.adjacency(maxDegree).orderBy("id")
      .select(concat_ws(" ", col("id"), col("neighbors").cast("array<string>")))
      .write.mode("overwrite").text(s"$base/adjacency")
    trainSplit.examples.orderBy("source", "target", "label")
      .select(concat_ws(" ", col("source"), col("target"), col("label")))
      .write.mode("overwrite").text(s"$base/train")
    testSplit.examples.orderBy("source", "target", "label")
      .select(concat_ws(" ", col("source"), col("target"), col("label")))
      .write.mode("overwrite").text(s"$base/test")
    val nF = g.nodes.select(size(col("features"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    BundleRef(name, dir, nF,
      new graft.util.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
  }

  /** Unsupervised bundle (distributed_nograd.py:19-34 shape): NO edge
    * split — the full graph's adjacency is the sampling structure, and
    * the training set is the walk-co-occurrence pair corpus
    * (UnsupervisedSampler parity via RandomWalk.unsupervisedPairs).
    * `test` stores the same pairs (the nograd pipeline never evaluates;
    * keeping the slot filled keeps one bundle format).
    */
  def writeUnsupervised(spark: SparkSession, dir: String, name: String,
                        g: PropertyGraph,
                        walkLength: Int = SageHyperParams.unsupervisedWalkLength,
                        nWalks: Int = SageHyperParams.unsupervisedNumWalks,
                        seed: Long = 42L, maxDegree: Int = Int.MaxValue): BundleRef = {
    val base = s"$dir/$name"
    // canonical (sorted) order throughout — see `write`: the loaded
    // row order feeds the trainer's seeded shuffle, so plan-internal
    // order drift is a training-dynamics change
    g.nodes.orderBy("id")
      .select(concat_ws(" ", col("id"), col("features").cast("array<string>")))
      .write.mode("overwrite").text(s"$base/features")
    g.adjacency(maxDegree).orderBy("id")
      .select(concat_ws(" ", col("id"), col("neighbors").cast("array<string>")))
      .write.mode("overwrite").text(s"$base/adjacency")
    val pairs = graft.graph.RandomWalk.unsupervisedPairs(g, walkLength, nWalks, seed)
      .orderBy("target", "context", "label")
      .select(concat_ws(" ", col("target"), col("context"), col("label")))
    pairs.write.mode("overwrite").text(s"$base/train")
    // test stores the same pairs (the slot-filled single bundle format,
    // see scaladoc): a byte-level copy of the written directory, not a
    // second Spark write job — identical files, half the ETL cost
    copyDir(s"$base/train", s"$base/test", spark.sparkContext.hadoopConfiguration)
    val nF = g.nodes.select(size(col("features"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    BundleRef(name, dir, nF,
      new graft.util.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
  }

  /** Task-side bundle load: plain Hadoop FS, no Spark — resolved with
    * the driver's Hadoop conf carried by the ref.
    */
  def load(ref: BundleRef): PartitionBundle = {
    val base = s"${ref.dir}/${ref.name}"
    val conf = ref.hadoopConf
    val features = readLines(s"$base/features", conf).map { line =>
      val t = line.split(' ')
      t(0).toLong -> t.iterator.drop(1).map(_.toFloat).toArray
    }.toMap
    val adjacency = readLines(s"$base/adjacency", conf).map { line =>
      val t = line.split(' ')
      t(0).toLong -> t.iterator.drop(1).map(_.toLong).toArray
    }.toMap
    def examples(sub: String): Array[(Long, Long, Int)] =
      readLines(s"$base/$sub", conf).map { line =>
        val t = line.split(' ')
        (t(0).toLong, t(1).toLong, t(2).toInt)
      }.toArray
    PartitionBundle(ref.name, features, adjacency,
      examples("train"), examples("test"), ref.numFeatures)
  }

  /** Recursive overwrite copy via the Hadoop FS API (works for any
    * Hadoop-compatible storage, same as the writes above).
    */
  private def copyDir(src: String, dst: String, conf: Configuration): Unit = {
    val from = new Path(src); val to = new Path(dst)
    val fs = FileSystem.get(from.toUri, conf)
    if (fs.exists(to)) fs.delete(to, true)
    org.apache.hadoop.fs.FileUtil.copy(fs, from, fs, to, false, conf): Unit
  }

  private def readLines(dirPath: String, conf: Configuration): Iterator[String] = {
    val p = new Path(dirPath)
    val fs = FileSystem.get(p.toUri, conf)
    val parts = fs.globStatus(new Path(p, "part-*")).sortBy(_.getPath.getName)
    parts.iterator.flatMap { st =>
      // read each part eagerly so its stream closes deterministically —
      // a lazy getLines() leaks one descriptor per part file until GC
      val in = fs.open(st.getPath)
      try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        src.getLines().filter(_.nonEmpty).toVector
      } finally in.close()
    }
  }
}
