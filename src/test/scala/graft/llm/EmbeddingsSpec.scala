package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Embedding-matrix analytics: hand-traced moments, vector-form ≡
  * long-form standardization, gramFast ≈ gramExact (the double twin's
  * error bound), PCA recovers a planted principal direction with
  * orthonormal components and descending non-negative eigenvalues.
  */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    (1L, Array(1.0f, 10.0f, 5.0f)),
    (2L, Array(3.0f, 10.0f, 7.0f)),
    (3L, Array(5.0f, 10.0f, 9.0f)),
    (4L, Array(7.0f, 10.0f, 11.0f))
  ).toDF("vec_id", "embedding")

  test("dimStats: hand-computed mean/std; constant dim has std 0") {
    val st = Embeddings.dimStats(fixture).orderBy("dim")
      .select("mean", "std").as[(Double, Double)].collect()
    assert(st(0)._1 === 4.0 && math.abs(st(0)._2 - math.sqrt(5.0)) < 1e-12)
    assert(st(1) === ((10.0, 0.0)))
    assert(st(2)._1 === 8.0)
  }

  test("standardize: zero mean / unit std per dim; constant dim maps to 0") {
    val z = Embeddings.standardize(fixture)
    val flat = z.select(posexplode(col("embedding")).as(Seq("dim", "x")))
    val st = flat.groupBy("dim")
      .agg(avg(col("x")).as("m"), stddev_pop(col("x")).as("s"))
      .orderBy("dim").as[(Int, Double, Double)].collect()
    assert(math.abs(st(0)._2) < 1e-12 && math.abs(st(0)._3 - 1.0) < 1e-12)
    assert(st(1)._2 === 0.0 && st(1)._3 === 0.0) // constant dim -> all zeros
    assert(math.abs(st(2)._3 - 1.0) < 1e-12)
  }

  test("vector-form standardize equals the q92 long form") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    val viaVec = Embeddings.standardize(emb)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "z")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        round(col("z"), 9).as("z"))
      .as[(Long, Long, Double)].collect().toSet
    val viaLong = graft.SparkEntry.queries("q92_dim_standardize")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaVec === viaLong)
    assert(viaVec.nonEmpty)
  }

  test("gramFast matches gramExact within 1e-9 relative") {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    val d = graft.Tables.EmbeddingDim
    val exact = Embeddings.gramExact(emb, d).collect()
      .map(r => ((r.getAs[Int]("i"), r.getAs[Int]("j")), r.getAs[Double]("g"))).toMap
    val fast = Embeddings.gramFast(emb, d)
    assert(exact.size === d * (d + 1) / 2)
    exact.foreach { case ((i, j), g) =>
      val rel = math.abs(fast(i)(j) - g) / math.max(1.0, math.abs(g))
      assert(rel < 1e-9, s"G($i,$j): fast ${fast(i)(j)} vs exact $g")
    }
  }

  test("gramExact: contract violations raise instead of silently degrading") {
    // a short vector would make element_at null and sum() would skip
    // it; an over-scale product would overflow the DECIMAL(18,12) cast
    // to null in non-ANSI mode — both must FAIL, not return a
    // plausible wrong gram (ADVICE round-10)
    val short = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      Embeddings.gramExact(short, dim = 3).collect()
    }
    assert(e1.getMessage.contains("gramExact contract violation"), e1.getMessage)
    val big = Seq((1L, Array(1.0f, 2e3f, 3.0f))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      Embeddings.gramExact(big, dim = 3).collect()
    }
    assert(e2.getMessage.contains("gramExact contract violation"), e2.getMessage)
    // in-contract rows still pass through the guard untouched
    assert(Embeddings.gramExact(fixture, dim = 3).count() === 6L)
  }

  test("pca: planted anisotropy recovered; components orthonormal, eigenvalues descending") {
    // planted: variance concentrated along (1,1,0,...)/sqrt(2)
    val rng = new scala.util.Random(11)
    val d = 8
    val rows = (0 until 400).map { i =>
      val big = rng.nextGaussian() * 10.0
      val v = Array.tabulate(d)(_ => rng.nextGaussian() * 0.3f.toDouble)
      v(0) += big / math.sqrt(2); v(1) += big / math.sqrt(2)
      (i.toLong, v.map(_.toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val p = Embeddings.pca(emb, d)
    // eigenvalues: descending, non-negative (covariance is PSD)
    p.eigenvalues.sliding(2).foreach(w => assert(w(0) >= w(1) - 1e-9))
    assert(p.eigenvalues.forall(_ >= -1e-9))
    // top component aligns with the planted direction
    val top = p.components(0)
    val cos = (top(0) + top(1)) / math.sqrt(2)
    assert(math.abs(cos) > 0.99, s"top component off-axis: cos=$cos")
    // orthonormality
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(i => p.components(a)(i) * p.components(b)(i)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"comp ${a}x$b = $dot")
    }
    // projection onto ALL components preserves total variance (trace)
    val means = Embeddings.dimStats(emb).orderBy("dim")
      .select("mean").as[Double].collect()
    val proj = Embeddings.project(emb, p, means, d)
    val pcCols = (0 until d).map(c => variancePop(proj, s"pc$c")).sum
    assert(math.abs(pcCols - p.eigenvalues.sum) < 1e-6,
      s"variance not preserved: $pcCols vs ${p.eigenvalues.sum}")
  }

  private def variancePop(df: org.apache.spark.sql.DataFrame, c: String): Double =
    df.agg(var_pop(col(c))).as[Double].head()
}
