package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the compression layer of a 10^10-vector ANN
  * index (IVF-PQ): each vector is cut into `m` subvectors and each
  * subvector replaced by the id of its nearest codebook centroid, so a
  * `dim × 4`-byte float vector stores as `m` small codes (64-dim float
  * = 256 B → m=8 codes ≈ 8 B, 32×). Queries score compressed codes
  * with ADC (asymmetric distance computation): the inner product
  * decomposes exactly over subspaces, `dot(q, x) = Σ_j dot(q_j, x_j)`,
  * so `Σ_j dot(q_j, centroid(x_j))` needs only an `m × k` lookup table
  * of partial dots per query — the corpus's raw floats are never read
  * at query time.
  *
  * Spark shape:
  *  - `trainCodebooks` runs one seeded spherical k-means per subspace
  *    (reusing `Similarity.kmeansCentroids` — sample-trained, same
  *    quantizer-training story as IVF) — m driver-coordinated jobs over
  *    sliced projections;
  *  - `encode` is a pure projection: per subspace a native `ArgmaxDot`
  *    over the broadcast (tiny) codebook — zero shuffle, the same
  *    map-side-assignment shape as IVF;
  *  - `adcTopK` collects only the PROBE vectors (driver-sized metadata,
  *    same contract as IVF's centroid collect), builds each query's
  *    m×k LUT driver-side, broadcasts it, and scans the code table
  *    once for all queries; ranking is the per-query window every
  *    other top-k here uses.
  *
  * No SQL oracle by construction (the output is defined by the trained
  * codebooks, like q33); PqSpec pins recall floors against the exact
  * scan, the 32× compression claim, and encode determinism.
  */
object Pq {

  /** m × k × (dim/m) codebooks. Plain Scala arrays — KBs at any scale. */
  type Codebooks = Array[Array[Array[Double]]]

  /** Train one codebook per subspace on (a sample of) the corpus.
    * `dim` must be divisible by `m`. The m subspace trainings are
    * independent Spark jobs — submitted from driver threads
    * (`Par.mapAll`) so the scheduler interleaves them instead of
    * running m serial critical paths; each training is seeded per
    * subspace, so concurrency cannot change any codebook.
    */
  def trainCodebooks(df: DataFrame, vecCol: String, dim: Int, m: Int, k: Int,
                     iters: Int = 3, seed: Long = 42L,
                     trainFraction: Double = 1.0): Codebooks = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    graft.util.Par.mapAll((0 until m).toSeq) { j =>
      val sliced = df.select(
        slice(col(vecCol).cast("array<double>"), j * sub + 1, sub).as("__sv"))
      Similarity.kmeansCentroids(sliced, k, iters, "__sv", seed + j, trainFraction)
    }.toArray
  }

  /** Quantize every row: `(idCol, codes ARRAY<INT>)`, `codes(j)` = the
    * subspace-j centroid nearest by the same rule the trainer assigns
    * with (dot against the L2-normalized centroid). Pure projection.
    *
    * Malformed vectors (wrong length / null elements) encode as -1
    * under `ArgmaxDot`'s contract; they are FILTERED here rather than
    * passed downstream, where code -1 would index LUT slot 0 of the
    * previous subspace — an ANSI error or a silently wrong `adc_sim`.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebooks: Codebooks): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val codeCols = (0 until m).map { j =>
      val normed = codebooks(j).map { c =>
        val n = math.sqrt(c.map(x => x * x).sum)
        (if (n == 0) c else c.map(_ / n)).toSeq
      }.toSeq
      graft.functions.ArgmaxDot(
        slice(col(vecCol).cast("array<double>"), j * sub + 1, sub), normed)
    }
    df.select(col(idCol), array(codeCols: _*).as("codes"))
      .filter(!array_contains(col("codes"), -1))
  }

  /** Collected probe set: (id, raw vector). Probe sets are
    * driver-sized by contract — exactly like IVF's k×dim centroid
    * collect. Shared by both ADC entry points.
    */
  private def collectProbes(queries: DataFrame, idCol: String,
                            vecCol: String): Array[(Long, Array[Double])] =
    queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map((r: Row) => (r.getLong(0), r.getSeq[Double](1).toArray))

  /** The (query_id, __lut) table of per-query partial-dot LUTs —
    * flat m×k layout, `lut[j*k + c] = dot(q_j, codebook_j(c))`. The
    * ONE LUT-construction source for [[adcTopK]] and [[ivfPqTopK]].
    */
  private def lutTable(spark: org.apache.spark.sql.SparkSession,
                       probes: Array[(Long, Array[Double])],
                       codebooks: Codebooks): DataFrame = {
    import spark.implicits._
    val m = codebooks.length
    val kCent = codebooks.head.length
    val sub = codebooks.head.head.length
    probes.toSeq.map { case (qid, q) =>
      val flat = new Array[Double](m * kCent)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < kCent) {
          var s = 0.0; var d = 0
          while (d < sub) { s += q(j * sub + d) * codebooks(j)(c)(d); d += 1 }
          flat(j * kCent + c) = s
          c += 1
        }
        j += 1
      }
      (qid, flat)
    }.toDF("query_id", "__lut")
  }

  /** ADC score of a `codes` row against the joined `__lut`:
    * `Σ_j lut[j*k + code_j]`, rounded to the family's 9 decimals.
    */
  private def adcSim(m: Int, kCent: Int): org.apache.spark.sql.Column =
    round(aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (code, j) => element_at(col("__lut"), (j * kCent + code + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x), 9)

  /** ADC top-k: score every encoded corpus row against every probe via
    * the per-query LUT of partial dots, rank per query. `queries` holds
    * RAW vectors (the asymmetric half). Output: (query_id, neighbor_id,
    * adc_sim, rank).
    */
  def adcTopK(codes: DataFrame, queries: DataFrame, codebooks: Codebooks,
              k: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.length
    val kCent = codebooks.head.length
    val probes = collectProbes(queries, idCol, vecCol)
    val luts = lutTable(codes.sparkSession, probes, codebooks)
    // one scan of the code table for all queries
    val scored = codes
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(luts))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adcSim(m, kCent).as("adc_sim"))
    // bounded-heap pre-trim below the per-query rank window (the q88
    // discipline — the query batch is contract-bounded)
    graft.operators.TopK.rankedTopKDesc(scored, "query_id", "adc_sim", "neighbor_id", k)
  }

  /** IVF-PQ — the full production ANN architecture at 10^10 vectors:
    * a coarse quantizer routes each vector to one inverted list AND the
    * vector stores as PQ codes, so a query ADC-scans only its `nProbe`
    * probed lists over m-byte codes. Degenerates to the exact full ADC
    * scan at nProbe = numCentroids (IvfPqSpec asserts equality with
    * `adcTopK`, the q26-style proof of the routing machinery).
    *
    * Spark shape: ONE zero-shuffle projection builds the whole index —
    * coarse assignment (native `ArgmaxDot` against the broadcast
    * centroid set) and PQ codes in the same scan; query-side probe
    * selection and LUTs are driver-side (probe sets are driver-sized by
    * contract, and the queries are already collected for the LUT); the
    * probed-list scan is an equi-join on centroid id against broadcast
    * (query, centroid) pairs. The only shuffle in the whole query is
    * the final per-query rank.
    */
  def ivfPqTopK(codes: DataFrame, queries: DataFrame, coarse: Array[Array[Double]],
                codebooks: Codebooks, k: Int, nProbe: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val kCent = codebooks.head.length
    val probes = collectProbes(queries, idCol, vecCol)
    // nProbe nearest coarse centroids per query, driver-side: cosine
    // rounded to 9 decimals then centroid id — the same total order the
    // IVF-Flat path uses
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0
      else BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val probePairs = probes.toSeq.flatMap { case (qid, q) =>
      coarse.zipWithIndex
        .map { case (c, i) => (-cos(q, c), i) }.sorted.take(nProbe)
        .map { case (_, i) => (qid, i) }
    }.toDF("query_id", "centroid_id")
    val luts = lutTable(spark, probes, codebooks)
    val scored = codes
      .join(broadcast(probePairs), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(luts), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), adcSim(m, kCent).as("adc_sim"))
    // bounded-heap pre-trim below the per-query rank window (the q88
    // discipline — the query batch is contract-bounded)
    graft.operators.TopK.rankedTopKDesc(scored, "query_id", "adc_sim", "neighbor_id", k)
  }

  /** Build the IVF-PQ index table in ONE zero-shuffle scan: coarse
    * inverted-list assignment (native argmax against the broadcast
    * centroids) plus PQ codes — `(neighbor_id, centroid_id, codes)`.
    * Malformed vectors (coarse or PQ argmax = -1) are filtered, same
    * contract as `encode`.
    */
  def indexIvfPq(df: DataFrame, idCol: String, vecCol: String,
                 coarse: Array[Array[Double]], codebooks: Codebooks): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val coarseNormed = coarse.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      (if (n == 0) c else c.map(_ / n)).toSeq
    }.toSeq
    val codeCols = (0 until m).map { j =>
      val normed = codebooks(j).map { c =>
        val n = math.sqrt(c.map(x => x * x).sum)
        (if (n == 0) c else c.map(_ / n)).toSeq
      }.toSeq
      graft.functions.ArgmaxDot(
        slice(col(vecCol).cast("array<double>"), j * sub + 1, sub), normed)
    }
    df.select(col(idCol).as("neighbor_id"),
      graft.functions.ArgmaxDot(col(vecCol).cast("array<double>"), coarseNormed)
        .as("centroid_id"),
      array(codeCols: _*).as("codes"))
      .filter(col("centroid_id") =!= -1 && !array_contains(col("codes"), -1))
  }

  /** Persist a built IVF-PQ index — (coarse centroids, per-subspace
    * codebooks, coded corpus) — as three parquet tables under `path`,
    * the way a real ANN service stores its index: built once (or
    * incrementally re-encoded), loaded by every query session. The
    * codes table keeps its full distribution; the two codebook tables
    * are driver-sized metadata (KBs) written as single files.
    */
  def saveIndex(path: String, codes: DataFrame,
                coarse: Array[Array[Double]], codebooks: Codebooks): Unit = {
    val spark = codes.sparkSession
    import spark.implicits._
    codes.write.mode("overwrite").parquet(s"$path/codes")
    coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/coarse")
    (for { j <- codebooks.indices; c <- codebooks(j).indices }
       yield (j, c, codebooks(j)(c).toSeq))
      .toDF("subspace", "code", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Incremental index maintenance — the other half of the ANN-service
    * story: new vectors are encoded with the STORED quantizers (no
    * retraining — retraining would re-code the whole corpus; periodic
    * retrains are a separate, heavier operation) and their code rows
    * appended to the codes table. Encoding is deterministic given the
    * codebooks, so append-then-load equals having indexed everything
    * in one pass (PqSpec pins this).
    */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    df: DataFrame, idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit = {
    val (_, coarse, cb) = loadIndex(spark, path)
    indexIvfPq(df, idCol, vecCol, coarse, cb)
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Load an index written by [[saveIndex]]: the codes DataFrame stays
    * lazy/distributed (queries scan it like any table); the coarse
    * centroids and codebooks collect to the driver arrays `ivfPqTopK`
    * expects — id/position order restored explicitly, so the loaded
    * index is bitwise the saved one regardless of file or row order.
    */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                path: String): (DataFrame, Array[Array[Double]], Codebooks) = {
    val codes = spark.read.parquet(s"$path/codes")
    val coarse = spark.read.parquet(s"$path/coarse")
      .collect().sortBy(_.getAs[Int]("centroid_id"))
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
    val codebooks = spark.read.parquet(s"$path/codebooks")
      .collect()
      .map(r => (r.getAs[Int]("subspace"), r.getAs[Int]("code"),
        r.getAs[scala.collection.Seq[Double]]("centroid").toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))
    (codes, coarse, codebooks)
  }
}
