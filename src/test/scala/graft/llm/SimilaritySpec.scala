package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN search: brute-force cosine top-k is the exact baseline; the LSH
  * and IVF paths are measured by recall@k against it on a clustered
  * synthetic corpus (ANN recall is only meaningful when the data has
  * neighborhood structure).
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** `nClusters` seeded Gaussian-ish clusters of `perCluster` 16-dim
    * vectors: cluster centers are well separated, members are center
    * + small noise — nearest neighbors are overwhelmingly in-cluster.
    */
  private def clustered(nClusters: Int, perCluster: Int, dim: Int = 16,
                        seed: Int = 11): DataFrame = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.nextGaussian() * 5))
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val v = centers(c).map(x => (x + rng.nextGaussian() * 0.3).toFloat)
      ((c * perCluster + i).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cosine column: orthogonal 0, identical 1, zero-vector guard") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 2f), Array(1f, 2f), 1.0),
      (Array(0f, 0f), Array(1f, 2f), 0.0)
    ).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("want"))
      .as[(Double, Double)].collect()
    got.foreach { case (c, want) => assert(math.abs(c - want) < 1e-9) }
  }

  test("brute-force top-k: in-cluster neighbors win on clustered data") {
    val df = clustered(4, 10).cache()
    val out = Similarity.bruteForceTopK(df, df.filter(col("vec_id") < 3), k = 5)
    val rows = out.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(rows.length === 15) // 3 queries x 5
    // queries 0,1,2 are in cluster 0 (ids 0..9): every top-5 neighbor in-cluster
    rows.foreach { case (q, n, _) => assert(n < 10, s"query $q matched out-of-cluster $n") }
    df.unpersist()
  }

  test("LSH top-k: recall@5 >= 0.8 on clustered data, deterministic; multiprobe >=") {
    val df = clustered(4, 25).cache()
    val queries = df.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5).cache()
    val approx = Similarity.lshTopK(df, queries, k = 5, numPlanes = 32, bands = 8)
    val r = Similarity.recallAtK(exact, approx)
    assert(r >= 0.8, s"LSH recall@5 = $r")
    val again = Similarity.lshTopK(df, queries, k = 5, numPlanes = 32, bands = 8)
    assert(approx.collect().toSet === again.collect().toSet)
    // multiprobe widens the candidate set -> recall can only improve
    val probed = Similarity.lshTopK(df, queries, k = 5, numPlanes = 32, bands = 8,
      multiProbe = true)
    assert(Similarity.recallAtK(exact, probed) >= r)
    exact.unpersist(); df.unpersist()
  }

  test("IVF top-k: recall@5 >= 0.8 with nProbe=4 of 8 centroids") {
    val df = clustered(4, 25).cache()
    val queries = df.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5).cache()
    val approx = Similarity.ivfTopK(df, queries, k = 5, numCentroids = 8, nProbe = 4)
    val r = Similarity.recallAtK(exact, approx)
    assert(r >= 0.8, s"IVF recall@5 = $r")
    exact.unpersist(); df.unpersist()
  }

  test("kmeansCentroids: tiny input with small trainFraction falls back to the full corpus") {
    // a Bernoulli 5% sample of 6 rows is usually empty — without the
    // fallback this aborted deep in ArgmaxDot with an opaque
    // empty-candidates error (the q33 sf0.001 warm-up shape)
    val df = clustered(2, 3)
    val cents = Similarity.kmeansCentroids(df, k = 4, iters = 2, seed = 7L,
      trainFraction = 0.05)
    assert(cents.nonEmpty && cents.length <= 4)
    assert(cents.forall(_.length === 16))
  }

  test("kmeans centroids recover planted cluster centers; trained IVF recall >= floor") {
    val nClusters = 4
    val df = clustered(nClusters, 25).cache()
    val cents = Similarity.kmeansCentroids(df, k = nClusters, iters = 5, seed = 11L)
    assert(cents.length === nClusters)
    // with k = #true clusters and well-separated centers, each trained
    // centroid should sit in some cluster: cosine to its nearest TRUE
    // center far above the cross-cluster level
    val trueCenters = df.as[(Long, Array[Float])].collect()
      .groupBy(_._1 / 25).values.map { mem =>
        val dim = mem.head._2.length
        Array.tabulate(dim)(d => mem.map(_._2(d).toDouble).sum / mem.size)
      }.toSeq
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    cents.foreach { c =>
      val best = trueCenters.map(t => cos(c, t)).max
      assert(best > 0.98, s"trained centroid matches no true center (best cos $best)")
    }
    // and every true center is claimed by some trained centroid
    trueCenters.foreach { t =>
      assert(cents.map(c => cos(c, t)).max > 0.98, "a true cluster lost its centroid")
    }
    val queries = df.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5).cache()
    val trained = Similarity.ivfTopK(df, queries, k = 5,
      numCentroids = nClusters, nProbe = 1, kmeansIters = 5)
    // nProbe=1 with per-cluster centroids: in-cluster neighbors are the
    // whole top-5, so even a single probed list must score high
    val r = Similarity.recallAtK(exact, trained)
    assert(r >= 0.9, s"trained-IVF recall@5 at nProbe=1 = $r")
    // sample-trained quantizer (the 10^10-vector practice): Lloyd
    // iterations see only a 25% seeded sample, the full corpus is still
    // assigned — recall floor must hold on the same fixture
    val sampled = Similarity.ivfTopK(df, queries, k = 5,
      numCentroids = nClusters, nProbe = 1, kmeansIters = 5, trainFraction = 0.25)
    val rs = Similarity.recallAtK(exact, sampled)
    assert(rs >= 0.9, s"sample-trained-IVF recall@5 at nProbe=1 = $rs")
    exact.unpersist(); df.unpersist()
  }

  test("embedding-cosine near-dup: planted near-identical copies are grouped") {
    val rng = new scala.util.Random(3)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
    // every 5th vector gets a near-identical copy (tiny perturbation)
    val dups = base.filter(_._1 % 5 == 0).map { case (id, v) =>
      (id + 1000L, v.map(x => x + rng.nextGaussian().toFloat * 1e-3f))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding").cache()
    val pairs = Similarity.cosinePairs(df, tau = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = base.filter(_._1 % 5 == 0).map(b => (b._1, b._1 + 1000L)).toSet
    // near-identical vectors share every LSH band -> full recall; random
    // 16-dim Gaussians are nowhere near cos 0.999 -> no false pairs
    assert(pairs === want)
    val groups = Similarity.cosineDupGroups(df, tau = 0.999)
      .as[(Long, Long)].collect().toMap
    want.foreach { case (a, b) =>
      assert(groups(a) === a && groups(b) === a) // min id is representative
    }
    df.unpersist()
  }

  test("hyperplane signature: close vectors agree on more bits than far ones") {
    val df = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.99f, 0.1f, 0f, 0f)),   // ~6 degrees from #1
      (3L, Array(-1f, 0f, 0f, 0f))        // opposite
    ).toDF("vec_id", "embedding")
    val sigs = df.select(col("vec_id"),
      Similarity.hyperplaneSignature(col("embedding"), 64, 42L, dim = 4).as("sig"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
    assert(ham(sigs(1L), sigs(3L)) > 48) // opposite vectors disagree on ~all planes
  }

  test("driver-built plane matrix is bit-identical to the expression formula") {
    // the literal-matrix signature must replicate the expression
    // `(pmod(xxhash64(lit(seed), j, d), 2000000).cast("double")/1e6)-1`
    // exactly — same catalyst XXH64, same fold order, same pmod
    val df = Seq((0, 0)).toDF("a", "b")
    for (j <- Seq(0, 1, 31); d <- Seq(0, 5, 63); seed <- Seq(42L, 7L)) {
      val expr = df.select(
        ((pmod(xxhash64(lit(seed), lit(j), lit(d)), lit(2000000)).cast("double")
          / 1000000.0) - 1.0).as("v")).head().getDouble(0)
      val driver = Similarity.planeComponent(j, d, seed)
      assert(driver === expr, s"plane ($j,$d,$seed): driver $driver vs expr $expr")
    }
  }

  test("rerankExact: full candidate set reproduces brute force; shortlist rerank lifts IVF") {
    val df = clustered(6, 30).cache()
    val queries = df.filter(col("vec_id") % 30 === 0)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5).cache()
    // reranking EVERY (query, corpus) pair must BE the brute-force
    // answer — same score rounding, same (sim desc, id) total order
    val allPairs = queries.select(col("vec_id").as("query_id"))
      .crossJoin(df.select(col("vec_id").as("neighbor_id")))
    val full = Similarity.rerankExact(allPairs, df, queries, k = 5)
    assert(full.select("query_id", "neighbor_id", "cos_sim", "rank").collect().toSet ===
      exact.select("query_id", "neighbor_id", "cos_sim", "rank").collect().toSet)
    // the production shape: a generous approximate shortlist reranked
    // exactly — recall@5 of the reranked list must be at least the raw
    // ANN path's (exact scoring can only fix candidate ordering)
    val shortlist = Similarity.ivfTopK(df, queries, k = 20,
      numCentroids = 6, nProbe = 2, kmeansIters = 3)
    val reranked = Similarity.rerankExact(shortlist, df, queries, k = 5)
    val rRerank = Similarity.recallAtK(exact, reranked)
    val rRaw = Similarity.recallAtK(exact,
      shortlist.filter(col("rank") <= 5))
    assert(rRerank >= rRaw, s"rerank $rRerank < raw $rRaw")
    assert(rRerank >= 0.9, s"reranked recall@5 $rRerank")
    exact.unpersist(); df.unpersist()
  }

  test("ivfTopKCurve equals per-setting ivfTopKWithCentroids, setting by setting") {
    // the q154 shared-pass device: one assignment + one scoring pass
    // must reproduce each separate sweep call row for row — and at
    // maxProbe = numCentroids the top branch must equal brute force
    // (every corpus vector sits in some probed list; self excluded on
    // both paths).
    val df = clustered(8, 25).cache()
    val queries = df.filter(col("vec_id") % 25 === 0)
    val cents = df.filter(col("vec_id") < 8) // pinned quantizer device
    val probes = Seq(1, 2, 4, 8)
    val curve = Similarity.ivfTopKCurve(df, queries, cents, k = 5,
        nProbes = probes, centroidIdCol = "vec_id")
      .select("n_probe", "query_id", "neighbor_id", "cos_sim", "rank")
      .as[(Int, Long, Long, Double, Int)].collect().groupBy(_._1)
    for (np <- probes) {
      val want = Similarity.ivfTopKWithCentroids(df, queries, cents, k = 5,
          centroidIdCol = "vec_id", nProbe = np)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      val got = curve(np).map(r => (r._2, r._3, r._4, r._5)).toSet
      assert(got === want, s"nProbe=$np")
    }
    val exact = Similarity.bruteForceTopK(df, queries, k = 5)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(curve(8).map(r => (r._2, r._3, r._4, r._5)).toSet === exact,
      "maxProbe = numCentroids branch must be the exact top-k")
    df.unpersist()
  }
}
