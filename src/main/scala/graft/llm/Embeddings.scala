package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-matrix analytics for training-data pipelines: per-dimension
  * standardization (feature whitening's first half), the gram/covariance
  * matrix, and PCA — the preprocessing SemDeDup-style semantic dedup and
  * embedding-quality audits run before anything else touches the
  * vectors.
  *
  * Determinism contract (the q61 decimal-moment pattern): every
  * cross-row sum is computed in DecimalType(30,15) — order-independent
  * by construction, so any partitioning of any cluster produces
  * bit-identical statistics, and a DuckDB oracle recomputes them
  * exactly. Per-value double→decimal rounding agrees across engines
  * because a random binary fraction's decimal expansion never
  * terminates at the rounding digit (no ties to break). The BLAS-speed
  * double-accumulation variant (`gramFast`) is the at-scale twin —
  * same numbers to ~1e-12 relative, NOT bit-stable (spec-bounded, like
  * q61's rationale for avoiding builtin corr()).
  */
object Embeddings {

  private val D = DecimalType(30, 15)

  /** gramExact's unit-scale magnitude bound: |x| ≤ 10³ keeps every
    * pairwise product within the DECIMAL(18,12) cast's 10⁶ integral
    * headroom, so an overflow-to-null can never slip into the sums.
    */
  val GramMaxAbs: Double = 1e3

  /** Per-dimension exact moments over `array<float>` vectors: one
    * keyed aggregate (map-side combinable) → `(dim, n, s1, s2, mean,
    * std)` — d rows, driver-collectable by contract (d is the model
    * dimension, bounded). Population std; zero-variance dims get
    * std = 0 (standardize maps them to 0 via a guard, never NaN).
    */
  def dimStats(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    emb.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "__x")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(D)).cast("double").as("s1"),
        sum((col("__x") * col("__x")).cast(D)).cast("double").as("s2"))
      .select(col("dim"), col("n"), col("s1"), col("s2"),
        (col("s1") / col("n")).as("mean"),
        sqrt(greatest(
          col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")),
          lit(0.0))).as("std"))

  /** Standardized vectors — `z_i = (x_i − mean_i) / std_i` (0 where a
    * dimension is constant): the per-dim stats collect to the driver
    * (d rows) and ride the projection as array literals, so the
    * transform itself is a ZERO-shuffle codegen'd map over the corpus
    * — the only cross-row work is `dimStats`' single aggregate.
    */
  def standardize(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val stats = dimStats(emb, vecCol).orderBy("dim").collect()
    val means = stats.map(_.getAs[Double]("mean"))
    val stds = stats.map(_.getAs[Double]("std"))
    val mLit = array(means.map(lit): _*)
    val sLit = array(stds.map(lit): _*)
    emb.withColumn(vecCol,
      zip_with(col(vecCol).cast("array<double>"),
        sequence(lit(0), lit(means.length - 1)),
        (x, i) => {
          val s = element_at(sLit, i + 1)
          when(s === 0.0, 0.0).otherwise((x - element_at(mLit, i + 1)) / s)
        }))
  }

  /** EXACT upper-triangle gram matrix `G(i,j) = Σ_rows x_i·x_j`
    * (i ≤ j) via decimal sums — bit-stable on any partitioning and
    * SQL-recomputable. Pair expansion is per-ROW (posexplode + a
    * suffix transform carrying no join), so the only shuffle is the
    * (i, j)-keyed aggregate of d(d+1)/2 groups with map-side combine.
    *
    * DATA CONTRACT, enforced per row (violations raise instead of
    * silently degrading — in non-ANSI mode an overflowing
    * DECIMAL(18,12) cast yields null and a short vector makes
    * element_at null, and sum() would SKIP those nulls, returning a
    * plausible but wrong gram): every vector must have exactly `dim`
    * elements with |x| ≤ 10³ (unit-scale embeddings — keeps every
    * product |x_i·x_j| ≤ 10⁶, inside the decimal cast's headroom).
    */
  def gramExact(emb: DataFrame, dim: Int, vecCol: String = "embedding"): DataFrame =
    emb.select(col(vecCol).cast("array<double>").as("__raw"))
      // the guard sits in the VALUE path (not a prunable side column):
      // rows only flow through the `when` branch that passed it
      .select(when(
          size(col("__raw")) === dim &&
            forall(col("__raw"), x => abs(x) <= lit(GramMaxAbs) && !isnull(x)),
          col("__raw"))
        .otherwise(raise_error(concat(
          lit(s"gramExact contract violation: need exactly $dim elements with |x| <= " +
            s"$GramMaxAbs and no nulls, got length "),
          size(col("__raw")).cast("string"), lit(": "),
          to_json(struct(col("__raw"))))))
        .as("__v"))
      // the d(d+1)/2-fold generator blowup inherits the INPUT's
      // partitioning — a corpus small enough to sit in one parquet
      // split would expand and partial-aggregate on ONE core (measured
      // 7.3 s → 1.9 s at sf0.1); round-robin the (small) vector rows
      // first so the expansion spreads over the cluster
      .repartition(emb.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col("__v"), posexplode(col("__v")).as(Seq("i", "__xi")))
      .select(col("i"),
        explode(transform(sequence(col("i"), lit(dim - 1)),
          j => struct(j.as("j"),
            (col("__xi") * element_at(col("__v"), j + 1)).as("__p")))).as("__e"))
      .select(col("i"), col("__e.j").as("j"), col("__e.__p").as("__p"))
      .groupBy(col("i"), col("j"))
      // precision 18 keeps Spark's Decimal on its compact-Long fast
      // path (precision > 18 falls back to per-operation BigDecimal —
      // measured 7.0 s → 1.4 s at sf0.1 for identical results);
      // |x_i·x_j| ≤ 1 for unit-scale embeddings, so scale 12 leaves
      // 10^6 of headroom for the per-group sum magnitude
      .agg(sum(col("__p").cast(DecimalType(18, 12))).cast("double").as("g"))

  /** BLAS-speed gram — one `treeAggregate` of per-partition d×d double
    * accumulators (the 100 TB shape: O(d²) bytes per partition, depth-2
    * combine). Double accumulation order varies with partitioning ⇒
    * NOT bit-stable; EmbeddingsSpec bounds it against `gramExact`.
    */
  def gramFast(emb: DataFrame, dim: Int, vecCol: String = "embedding"): Array[Array[Double]] = {
    val vecs = emb.select(col(vecCol).cast("array<double>"))
      .rdd.map(_.getSeq[Double](0).toArray)
    val acc = vecs.treeAggregate(Array.ofDim[Double](dim, dim))(
      seqOp = (g, v) => {
        var i = 0
        while (i < dim) {
          val xi = v(i); var j = i
          while (j < dim) { g(i)(j) += xi * v(j); j += 1 }
          i += 1
        }
        g
      },
      combOp = (a, b) => {
        var i = 0
        while (i < dim) {
          var j = i
          while (j < dim) { a(i)(j) += b(i)(j); j += 1 }
          i += 1
        }
        a
      },
      depth = 2)
    var i = 0
    while (i < dim) { var j = 0; while (j < i) { acc(i)(j) = acc(j)(i); j += 1 }; i += 1 }
    acc
  }

  /** PCA of the corpus: covariance from the EXACT gram + exact means
    * (`cov_ij = G_ij/n − mean_i·mean_j`), eigendecomposition on the
    * DRIVER (d×d — model-dimension-sized, the same contract as the
    * k-means/PQ codebook collects), components returned
    * variance-descending with a sign convention (largest-|loading|
    * coordinate positive) so the output is deterministic up to
    * eigenvalue ties. Projection of the corpus onto the top k is a
    * zero-shuffle map with the components as broadcast literals.
    */
  final case class Pca(eigenvalues: Array[Double], components: Array[Array[Double]])

  def pca(emb: DataFrame, dim: Int, vecCol: String = "embedding"): Pca = {
    val stats = dimStats(emb, vecCol).orderBy("dim").collect()
    val n = stats.head.getAs[Long]("n").toDouble
    val means = stats.map(_.getAs[Double]("mean"))
    val g = Array.ofDim[Double](dim, dim)
    gramExact(emb, dim, vecCol).collect().foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val c = r.getAs[Double]("g") / n - means(i) * means(j)
      g(i)(j) = c; g(j)(i) = c
    }
    val es = breeze.linalg.eigSym(breeze.linalg.DenseMatrix(g: _*))
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).map(_._2)
    val values = order.map(es.eigenvalues.toArray)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => es.eigenvectors(r, c))
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(x => -x) else v
    }
    Pca(values, comps)
  }

  /** Project vectors onto the top-k PCA components (mean-centered):
    * zero-shuffle map, components ride as literals.
    */
  def project(emb: DataFrame, p: Pca, means: Array[Double], k: Int,
              vecCol: String = "embedding"): DataFrame = {
    val compCols: Seq[Column] = (0 until k).map { c =>
      val w = p.components(c)
      val dot = (0 until w.length).map { i =>
        (element_at(col(vecCol).cast("array<double>"), i + 1) - lit(means(i))) * lit(w(i))
      }.reduce(_ + _)
      dot.as(s"pc$c")
    }
    emb.select(col("*") +: compCols: _*)
  }
}
