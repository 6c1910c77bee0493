package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization: recall floor of the compressed ADC scan
  * against the exact baseline, the compression claim, and encode
  * determinism. Vectors are L2-normalized first so ADC's inner-product
  * estimate ranks like the exact cosine it is measured against.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  private def clustered(nClusters: Int, perCluster: Int, seed: Int = 11,
                        noise: Double = 0.3): DataFrame = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.nextGaussian() * 5))
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val v = centers(c).map(x => x + rng.nextGaussian() * noise)
      val n = math.sqrt(v.map(x => x * x).sum)
      ((c * perCluster + i).toLong, v.map(x => (x / n).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("ADC over 4x-compressed codes: coarse geometry kept, estimate error bounded") {
    // PQ cannot rank WITHIN a blob its codes can't distinguish — its
    // contract is (a) the compressed scores preserve coarse geometry
    // (a query's top-k comes from its own cluster) and (b) the ADC
    // score is a tight estimate of the true dot product. Assert both.
    val df = clustered(4, 50, noise = 1.0).cache()
    val queries = df.filter(col("vec_id") % 25 === 0)
    val books = Pq.trainCodebooks(df, "embedding", dim, m = 4, k = 16,
      iters = 3, seed = 7L)
    assert(books.length === 4 && books.forall(_.forall(_.length === dim / 4)))
    val codes = Pq.encode(df, "vec_id", "embedding", books).cache()
    // compression: 16 floats (64 B) -> 4 codes of k<=16 (4 B as bytes)
    assert(codes.select(size(col("codes"))).distinct().as[Int].collect().toSeq === Seq(4))
    val approx = Pq.adcTopK(codes, queries, books, k = 10).cache()
    // (a) cluster precision@10: ids 0..49 cluster 0, 50..99 cluster 1...
    val hits = approx.select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
      .collect()
    val inCluster = hits.count { case (q, n) => q / 50 === n / 50 }
    assert(inCluster.toDouble / hits.length >= 0.9,
      s"only $inCluster/${hits.length} ADC top-10 hits in the query's cluster")
    // (b) |adc_sim - exact cosine| on the returned pairs (vectors are
    // unit-norm, so exact dot = cosine)
    val exactAll = Similarity.bruteForceTopK(df, queries, k = 200).cache()
    val err = approx.join(exactAll, Seq("query_id", "neighbor_id"))
      .select(abs(col("adc_sim") - col("cos_sim")).as("e"))
      .agg(avg(col("e")), max(col("e"))).as[(Double, Double)].head()
    assert(err._1 <= 0.05, s"mean ADC estimate error ${err._1}")
    assert(err._2 <= 0.15, s"max ADC estimate error ${err._2}")
    exactAll.unpersist(); approx.unpersist(); codes.unpersist(); df.unpersist()
  }

  test("IVF-PQ at nProbe=all equals the full ADC scan; nProbe=1 stays in-cluster") {
    val df = clustered(4, 50, noise = 1.0).cache()
    val queries = df.filter(col("vec_id") % 25 === 0)
    val books = Pq.trainCodebooks(df, "embedding", dim, m = 4, k = 16,
      iters = 3, seed = 7L)
    val coarse = Similarity.kmeansCentroids(
      df.select(col("embedding").cast("array<double>").as("__v")),
      k = 4, iters = 3, vecCol = "__v", seed = 13L)
    val index = Pq.indexIvfPq(df, "vec_id", "embedding", coarse, books).cache()
    // the index assigns every row to exactly one inverted list
    assert(index.count() === 200L)
    // degeneracy proof: probing every list IS the full ADC scan
    val full = Pq.adcTopK(Pq.encode(df, "vec_id", "embedding", books),
        queries, books, k = 10)
      .select("query_id", "neighbor_id", "adc_sim", "rank").collect().toSet
    val all = Pq.ivfPqTopK(index, queries, coarse, books, k = 10, nProbe = 4)
      .select("query_id", "neighbor_id", "adc_sim", "rank").collect().toSet
    assert(all === full, "nProbe=all must reproduce the exact ADC scan")
    // production setting: one probed list still serves in-cluster top-k
    val one = Pq.ivfPqTopK(index, queries, coarse, books, k = 10, nProbe = 1)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect()
    val inCluster = one.count { case (q, n) => q / 50 === n / 50 }
    assert(inCluster.toDouble / one.length >= 0.9,
      s"only $inCluster/${one.length} nProbe=1 hits in the query's cluster")
    index.unpersist(); df.unpersist()
  }

  test("lossless mode (k >= corpus): ADC equals the exact dot-product top-k (q47 contract)") {
    // with every subvector its own centroid (k = n, iters = 0: the
    // hash-sample init returns all rows, Lloyd never moves them),
    // encoding is the identity and ADC collapses to the exact dot
    // product — the q47 oracle construction, pinned here against the
    // engine's own exact scan
    val df = clustered(3, 12, seed = 23)
    val queries = df.filter(col("vec_id") < 4)
    val books = Pq.trainCodebooks(df, "embedding", dim, m = 4, k = 36,
      iters = 0, seed = 7L)
    val approx = Pq.adcTopK(Pq.encode(df, "vec_id", "embedding", books),
      queries, books, k = 8)
    // exact dot-product rank twin (same round-9 + id total order; dot,
    // not cosine — ADC estimates the inner product)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").cast("array<double>").as("__qv"))
    val c = df.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("__cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("dot_sim").desc, col("neighbor_id").asc)
    val exact = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.dot(col("__qv"), col("__cv")), 9).as("dot_sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 8)
    val got = approx.select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val want = exact.select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got === want, "lossless ADC must reproduce the exact ranking")
    // and the scores themselves are the rounded exact dots
    val simDiff = approx.join(exact, Seq("query_id", "neighbor_id"))
      .select(max(abs(col("adc_sim") - col("dot_sim")))).as[Double].head()
    assert(simDiff <= 1e-9, s"lossless ADC scores drifted by $simDiff")
  }

  test("malformed vectors (wrong length / null element) are filtered at encode") {
    val good = clustered(2, 10, seed = 31)
    val books = Pq.trainCodebooks(good, "embedding", dim, m = 2, k = 4,
      iters = 1, seed = 3L)
    val short = Seq((900L, Array.fill(dim - 3)(0.5f))).toDF("vec_id", "embedding")
    val withNull = Seq((901L, (0 until dim).map(i =>
      if (i == 5) null else java.lang.Float.valueOf(0.5f)))).toDF("vec_id", "embedding")
    val corpus = good.unionByName(short).unionByName(withNull)
    val codes = Pq.encode(corpus, "vec_id", "embedding", books)
    val ids = codes.select(col("vec_id")).as[Long].collect().toSet
    assert(!ids.contains(900L) && !ids.contains(901L),
      "malformed rows must not reach the ADC scan (code -1 would corrupt the LUT index)")
    assert(ids.size === 20, "well-formed rows must all survive")
    // ... and at the IVF-PQ index build
    val coarse = Similarity.kmeansCentroids(
      good.select(col("embedding").cast("array<double>").as("__v")),
      k = 2, iters = 1, vecCol = "__v", seed = 13L)
    val idxIds = Pq.indexIvfPq(corpus, "vec_id", "embedding", coarse, books)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(!idxIds.contains(900L) && !idxIds.contains(901L) && idxIds.size === 20)
  }

  test("encode is deterministic and assignment-consistent") {
    val df = clustered(2, 30)
    val books = Pq.trainCodebooks(df, "embedding", dim, m = 2, k = 8,
      iters = 2, seed = 3L)
    def codeMap = Pq.encode(df, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val once = codeMap
    assert(codeMap === once, "same codebooks must yield identical codes")
    assert(once.values.flatten.forall(c => c >= 0 && c < 8))
  }

  test("ADC ranks an exact-centroid vector highest for its own query") {
    // a corpus vector that IS a codebook reconstruction scores exactly
    // its LUT sum — sanity of the lookup arithmetic (hand-checkable)
    val df = clustered(2, 20)
    val books = Pq.trainCodebooks(df, "embedding", dim, m = 2, k = 4,
      iters = 2, seed = 5L)
    val codes = Pq.encode(df, "vec_id", "embedding", books)
    val queries = df.filter(col("vec_id") === 0)
    val top = Pq.adcTopK(codes, queries, books, k = 5)
      .orderBy(col("rank")).collect()
    assert(top.length === 5)
    // in-cluster neighbors (ids < 20 share query 0's cluster) dominate
    val inCluster = top.count(_.getLong(1) < 20)
    assert(inCluster >= 4, s"only $inCluster of top-5 in the query's cluster")
  }

  test("index persistence: load(save(index)) serves identical top-k (q48 storage path)") {
    val df = clustered(4, 50, noise = 1.0).cache()
    val queries = df.filter(col("vec_id") % 25 === 0)
    val books = Pq.trainCodebooks(df, "embedding", dim, m = 4, k = 16,
      iters = 3, seed = 7L)
    val coarse = Similarity.kmeansCentroids(
      df.select(col("embedding").cast("array<double>").as("__v")),
      k = 4, iters = 3, vecCol = "__v", seed = 13L)
    val index = Pq.indexIvfPq(df, "vec_id", "embedding", coarse, books)
    val live = Pq.ivfPqTopK(index, queries, coarse, books, k = 10, nProbe = 2)
      .select("query_id", "neighbor_id", "adc_sim", "rank").collect().toSet

    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/idx"
    Pq.saveIndex(path, index, coarse, books)
    val (codes2, coarse2, books2) = Pq.loadIndex(spark, path)
    // metadata round-trips bitwise: same centroids, same codebooks
    assert(coarse2.map(_.toSeq).toSeq === coarse.map(_.toSeq).toSeq)
    assert(books2.map(_.map(_.toSeq).toSeq).toSeq ===
      books.map(_.map(_.toSeq).toSeq).toSeq)
    // and the stored index answers queries identically to the live one
    val stored = Pq.ivfPqTopK(codes2, queries, coarse2, books2, k = 10, nProbe = 2)
      .select("query_id", "neighbor_id", "adc_sim", "rank").collect().toSet
    assert(stored === live)
    df.unpersist()
  }

  test("incremental append: index(half) + append(half) equals index(all) (no retrain)") {
    val df = clustered(4, 50, noise = 1.0).cache()
    val queries = df.filter(col("vec_id") % 25 === 0)
    val books = Pq.trainCodebooks(df, "embedding", dim, m = 4, k = 16,
      iters = 3, seed = 7L)
    val coarse = Similarity.kmeansCentroids(
      df.select(col("embedding").cast("array<double>").as("__v")),
      k = 4, iters = 3, vecCol = "__v", seed = 13L)
    val oneShot = Pq.ivfPqTopK(Pq.indexIvfPq(df, "vec_id", "embedding", coarse, books),
        queries, coarse, books, k = 10, nProbe = 2)
      .select("query_id", "neighbor_id", "adc_sim", "rank").collect().toSet

    val path = java.nio.file.Files.createTempDirectory("ivfpq-app").toString + "/idx"
    val (a, b) = (df.filter(col("vec_id") % 2 === 0), df.filter(col("vec_id") % 2 =!= 0))
    Pq.saveIndex(path, Pq.indexIvfPq(a, "vec_id", "embedding", coarse, books),
      coarse, books)
    Pq.appendToIndex(spark, path, b)
    val (codes2, coarse2, books2) = Pq.loadIndex(spark, path)
    assert(codes2.count() === 200L, "appended rows must land in the codes table")
    // encoding is deterministic given the stored quantizers, so the
    // incrementally-grown index answers exactly like the one-shot build
    val grown = Pq.ivfPqTopK(codes2, queries, coarse2, books2, k = 10, nProbe = 2)
      .select("query_id", "neighbor_id", "adc_sim", "rank").collect().toSet
    assert(grown === oneShot)
    df.unpersist()
  }
}
