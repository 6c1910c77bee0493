package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector}

import graft.fed.FedAvg.Weights
import graft.sources.LayerTensor

/** Hyperparameters — defaults mirror the reference's supervised model
  * (models/supervised.py:50-63): samples [20,10], layers [10,10],
  * batch 20, Adam lr 1e-2, dropout 0.1. The unsupervised profile
  * (models/unsupervised.py:29-46) is layers [256,256], samples [25,10],
  * batch 16 (walk length 5, 1 walk per node), lr 1e-3.
  */
final case class SageHyperParams(
    numSamples: (Int, Int) = (20, 10),
    layerSizes: (Int, Int) = (10, 10),
    batchSize: Int = 20,
    learningRate: Double = 1e-2,
    dropout: Double = 0.1,
    seed: Long = 42L) {
  require(layerSizes._1 % 2 == 0 && layerSizes._2 % 2 == 0,
    "layer sizes must be even (self/neighbor concat halves)")
}

object SageHyperParams {
  /** The reference's unsupervised profile (models/unsupervised.py:29-46):
    * samples [25,10], layers [256,256], batch 16, Adam 1e-3, no dropout;
    * walk corpus = length-5 walks, 1 per node.
    */
  val unsupervised: SageHyperParams = SageHyperParams(
    numSamples = (25, 10), layerSizes = (256, 256), batchSize = 16,
    learningRate = 1e-3, dropout = 0.0)
  val unsupervisedWalkLength = 5
  val unsupervisedNumWalks = 1
}

/** G6–G10 — a 2-layer mean-aggregator GraphSAGE link-prediction model,
  * trained with hand-derived gradients + Adam (Spark has no autodiff;
  * SURVEY §7.4-1). One instance owns ONE graph partition's in-memory
  * state and runs inside a single executor task — the reference's
  * one-partition-per-process design (mem.py sizes the partition to fit).
  *
  * Forward semantics (StellarGraph MeanAggregator,
  * models/supervised.py:52-63 / models/unsupervised.py:63-67):
  * per layer `h = act(concat(W_self·x_self, W_neigh·mean(x_neighbors)) + b)`,
  * relu on layer 1, linear on layer 2, then row-wise L2 normalization;
  * link score = `sigmoid(dot(e_src, e_dst))` ("ip" edge embedding,
  * models/supervised.py:94-96); loss = binary cross-entropy.
  *
  * Math is Double-precision Breeze (weights cross the FedModel boundary
  * as Float per the engine-wide LayerTensor contract). Neighbor
  * sampling inside the trainer is seeded-deterministic; sentinel -1
  * (no neighbor) contributes a zero feature vector, as StellarGraph
  * pads.
  */
final class LocalGraphSage(
    val hp: SageHyperParams,
    features: Map[Long, Array[Float]],
    adjacency: Map[Long, Array[Long]],
    val numFeatures: Int) extends Serializable {

  private val (k1, k2) = hp.numSamples
  private val (d1, d2) = hp.layerSizes
  private val h1 = d1 / 2
  private val h2 = d2 / 2

  // ---- weights (row-major LayerTensor <-> Breeze col-major) ----
  private var w1s = DenseMatrix.zeros[Double](numFeatures, h1)
  private var w1n = DenseMatrix.zeros[Double](numFeatures, h1)
  private var b1 = DenseVector.zeros[Double](d1)
  private var w2s = DenseMatrix.zeros[Double](d1, h2)
  private var w2n = DenseMatrix.zeros[Double](d1, h2)
  private var b2 = DenseVector.zeros[Double](d2)

  // Adam state
  private var adamT = 0
  private var adamM: Array[DenseMatrix[Double]] = _
  private var adamV: Array[DenseMatrix[Double]] = _
  private var adamMb: Array[DenseVector[Double]] = _
  private var adamVb: Array[DenseVector[Double]] = _
  private val beta1 = 0.9; private val beta2 = 0.999; private val adamEps = 1e-7
  resetAdam()

  /** Glorot-uniform init (Keras default), seeded. Resets Adam state. */
  def initializeWeights(): Weights = {
    val rng = new scala.util.Random(hp.seed)
    def glorot(rows: Int, cols: Int): DenseMatrix[Double] = {
      val limit = math.sqrt(6.0 / (rows + cols))
      DenseMatrix.fill(rows, cols)(rng.nextDouble() * 2 * limit - limit)
    }
    w1s = glorot(numFeatures, h1); w1n = glorot(numFeatures, h1)
    b1 = DenseVector.zeros[Double](d1)
    w2s = glorot(d1, h2); w2n = glorot(d1, h2)
    b2 = DenseVector.zeros[Double](d2)
    resetAdam()
    getWeights
  }

  private def resetAdam(): Unit = {
    adamT = 0
    adamM = Array(w1s, w1n, w2s, w2n).map(m => DenseMatrix.zeros[Double](m.rows, m.cols))
    adamV = Array(w1s, w1n, w2s, w2n).map(m => DenseMatrix.zeros[Double](m.rows, m.cols))
    adamMb = Array(b1, b2).map(v => DenseVector.zeros[Double](v.length))
    adamVb = Array(b1, b2).map(v => DenseVector.zeros[Double](v.length))
  }

  def getWeights: Weights = Seq(
    toTensor(0, w1s), toTensor(1, w1n),
    LayerTensor(2, Seq(d1), b1.toArray.map(_.toFloat)),
    toTensor(3, w2s), toTensor(4, w2n),
    LayerTensor(5, Seq(d2), b2.toArray.map(_.toFloat)))

  /** Replace the weights, KEEPING optimizer slots — Keras `set_weights`
    * semantics: the reference's long-lived clients receive fresh global
    * weights every round while their Adam moments persist
    * (fl_client.py:119-175). `initializeWeights` is the full reset.
    */
  def setWeights(w: Weights): Unit = {
    require(w.length == 6, s"expected 6 layer tensors, got ${w.length}")
    w1s = fromTensor(w(0), numFeatures, h1)
    w1n = fromTensor(w(1), numFeatures, h1)
    b1 = DenseVector(w(2).values.map(_.toDouble))
    w2s = fromTensor(w(3), d1, h2)
    w2n = fromTensor(w(4), d1, h2)
    b2 = DenseVector(w(5).values.map(_.toDouble))
  }

  private def toTensor(layer: Int, m: DenseMatrix[Double]): LayerTensor = {
    val out = new Array[Float](m.rows * m.cols)
    var r = 0
    while (r < m.rows) { var c = 0; while (c < m.cols) { out(r * m.cols + c) = m(r, c).toFloat; c += 1 }; r += 1 }
    LayerTensor(layer, Seq(m.rows, m.cols), out)
  }

  private def fromTensor(t: LayerTensor, rows: Int, cols: Int): DenseMatrix[Double] = {
    require(t.shape == Seq(rows, cols), s"layer ${t.layer}: shape ${t.shape} != ($rows,$cols)")
    val m = DenseMatrix.zeros[Double](rows, cols)
    var r = 0
    while (r < rows) { var c = 0; while (c < cols) { m(r, c) = t.values(r * cols + c); c += 1 }; r += 1 }
    m
  }

  // ---- sampling (seeded, task-local) ----
  private def sampleNeighborsOf(v: Long, k: Int, rng: java.util.Random): Array[Long] = {
    val nbrs = if (v == -1L) null else adjacency.getOrElse(v, null)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      out(i) = if (nbrs == null || nbrs.isEmpty) -1L else nbrs(rng.nextInt(nbrs.length))
      i += 1
    }
    out
  }

  private def featRow(m: DenseMatrix[Double], row: Int, v: Long): Unit = {
    if (v != -1L) features.get(v).foreach { f =>
      var c = 0; while (c < numFeatures) { m(row, c) = f(c); c += 1 }
    } // else leave zeros (StellarGraph zero-pad)
  }

  // ---- forward ----
  /** Per-tower forward cache for backprop. */
  private final case class TowerCache(
      x0: DenseMatrix[Double], m1: DenseMatrix[Double],
      x1: DenseMatrix[Double], m2: DenseMatrix[Double],
      a1root: DenseMatrix[Double], h1root: DenseMatrix[Double],
      a1n: DenseMatrix[Double], h1n: DenseMatrix[Double],
      mh: DenseMatrix[Double], h2out: DenseMatrix[Double],
      emb: DenseMatrix[Double], norms: DenseVector[Double],
      drop: Seq[DenseMatrix[Double]])

  private def relu(m: DenseMatrix[Double]): DenseMatrix[Double] = m.map(x => if (x > 0) x else 0.0)

  private def dropMask(rows: Int, cols: Int, rng: java.util.Random, train: Boolean): DenseMatrix[Double] =
    if (!train || hp.dropout == 0.0) null
    else {
      val keep = 1.0 - hp.dropout
      DenseMatrix.fill(rows, cols)(if (rng.nextDouble() < keep) 1.0 / keep else 0.0)
    }

  private def applyMask(m: DenseMatrix[Double], mask: DenseMatrix[Double]): DenseMatrix[Double] =
    if (mask == null) m else m *:* mask

  /** Forward one tower for `roots`; dropout active only when `train`. */
  private def forwardTower(roots: Array[Long], rng: java.util.Random,
                           train: Boolean): TowerCache = {
    val b = roots.length
    // sample tree
    val lvl1 = new Array[Long](b * k1)
    val lvl2 = new Array[Long](b * k1 * k2)
    var i = 0
    while (i < b) {
      val n1 = sampleNeighborsOf(roots(i), k1, rng)
      var j = 0
      while (j < k1) {
        lvl1(i * k1 + j) = n1(j)
        val n2 = sampleNeighborsOf(n1(j), k2, rng)
        System.arraycopy(n2, 0, lvl2, (i * k1 + j) * k2, k2)
        j += 1
      }
      i += 1
    }
    // feature matrices
    val x0 = DenseMatrix.zeros[Double](b, numFeatures)
    i = 0; while (i < b) { featRow(x0, i, roots(i)); i += 1 }
    val x1 = DenseMatrix.zeros[Double](b * k1, numFeatures)
    i = 0; while (i < b * k1) { featRow(x1, i, lvl1(i)); i += 1 }
    val x2 = DenseMatrix.zeros[Double](b * k1 * k2, numFeatures)
    i = 0; while (i < b * k1 * k2) { featRow(x2, i, lvl2(i)); i += 1 }
    // neighbor means
    val m1 = meanBlocks(x1, k1)        // b × F
    val m2 = meanBlocks(x2, k2)        // b*k1 × F
    // dropout masks on every layer input (Keras GraphSAGE drops inputs)
    val dx0 = dropMask(b, numFeatures, rng, train)
    val dm1 = dropMask(b, numFeatures, rng, train)
    val dx1 = dropMask(b * k1, numFeatures, rng, train)
    val dm2 = dropMask(b * k1, numFeatures, rng, train)
    val x0d = applyMask(x0, dx0); val m1d = applyMask(m1, dm1)
    val x1d = applyMask(x1, dx1); val m2d = applyMask(m2, dm2)
    // layer 1 on root and on level-1 nodes (shared weights)
    val a1root = concatBias(x0d * w1s, m1d * w1n, b1)
    val h1rootM = relu(a1root)
    val a1n = concatBias(x1d * w1s, m2d * w1n, b1)
    val h1nM = relu(a1n)
    // layer-2 inputs (dropout on them too)
    val dh1r = dropMask(b, d1, rng, train)
    val dmh = dropMask(b, d1, rng, train)
    val mh = meanBlocks(h1nM, k1)      // b × d1
    val h1rd = applyMask(h1rootM, dh1r); val mhd = applyMask(mh, dmh)
    val h2out = concatBias(h1rd * w2s, mhd * w2n, b2) // linear activation
    // row-wise L2 normalize
    val emb = DenseMatrix.zeros[Double](b, d2)
    val norms = DenseVector.zeros[Double](b)
    i = 0
    while (i < b) {
      var s = 0.0; var c = 0
      while (c < d2) { s += h2out(i, c) * h2out(i, c); c += 1 }
      val n = math.sqrt(s)
      norms(i) = if (n == 0.0) 1.0 else n
      c = 0; while (c < d2) { emb(i, c) = h2out(i, c) / norms(i); c += 1 }
      i += 1
    }
    TowerCache(applyMask(x0, dx0), m1d, x1d, m2d, a1root, h1rd, a1n, h1nM, mhd,
      h2out, emb, norms, Seq(dh1r, dmh))
  }

  /** mean over consecutive row blocks of size `k`: (n·k × c) → (n × c). */
  private def meanBlocks(m: DenseMatrix[Double], k: Int): DenseMatrix[Double] = {
    val n = m.rows / k
    val out = DenseMatrix.zeros[Double](n, m.cols)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < k) {
        var c = 0
        while (c < m.cols) { out(i, c) += m(i * k + j, c) / k; c += 1 }
        j += 1
      }
      i += 1
    }
    out
  }

  private def concatBias(zs: DenseMatrix[Double], zn: DenseMatrix[Double],
                         bias: DenseVector[Double]): DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](zs.rows, zs.cols + zn.cols)
    var i = 0
    while (i < zs.rows) {
      var c = 0
      while (c < zs.cols) { out(i, c) = zs(i, c) + bias(c); c += 1 }
      c = 0
      while (c < zn.cols) { out(i, zs.cols + c) = zn(i, c) + bias(zs.cols + c); c += 1 }
      i += 1
    }
    out
  }

  // ---- gradients ----
  private final class Grads {
    val gW1s = DenseMatrix.zeros[Double](numFeatures, h1)
    val gW1n = DenseMatrix.zeros[Double](numFeatures, h1)
    val gB1 = DenseVector.zeros[Double](d1)
    val gW2s = DenseMatrix.zeros[Double](d1, h2)
    val gW2n = DenseMatrix.zeros[Double](d1, h2)
    val gB2 = DenseVector.zeros[Double](d2)
  }

  /** Backprop dL/dEmb through one tower, accumulating into `g`. */
  private def backwardTower(tc: TowerCache, dEmb: DenseMatrix[Double], g: Grads): Unit = {
    val b = dEmb.rows
    // through L2 normalize: dH2 = (g - emb*(g·emb)) / norm, per row
    val dH2 = DenseMatrix.zeros[Double](b, d2)
    var i = 0
    while (i < b) {
      var dotGE = 0.0; var c = 0
      while (c < d2) { dotGE += dEmb(i, c) * tc.emb(i, c); c += 1 }
      c = 0
      while (c < d2) { dH2(i, c) = (dEmb(i, c) - tc.emb(i, c) * dotGE) / tc.norms(i); c += 1 }
      i += 1
    }
    // layer 2 (linear): A2 = [h1rd*w2s | mhd*w2n] + b2
    val dZ2s = colRange(dH2, 0, h2)
    val dZ2n = colRange(dH2, h2, d2)
    g.gB2 :+= colSums(dH2)
    g.gW2s :+= tc.h1root.t * dZ2s
    g.gW2n :+= tc.mh.t * dZ2n
    var dH1root = dZ2s * w2s.t
    var dMh = dZ2n * w2n.t
    // undo layer-2 input dropout
    if (tc.drop.head != null) dH1root = dH1root *:* tc.drop.head
    if (tc.drop(1) != null) dMh = dMh *:* tc.drop(1)
    // mean over k1: spread dMh to each of the k1 rows / k1
    val dH1n = spreadBlocks(dMh, k1)
    // relu backward
    val dA1root = reluBack(dH1root, tc.a1root)
    val dA1n = reluBack(dH1n, tc.a1n)
    // layer 1 on roots
    g.gB1 :+= colSums(dA1root)
    g.gW1s :+= tc.x0.t * colRange(dA1root, 0, h1)
    g.gW1n :+= tc.m1.t * colRange(dA1root, h1, d1)
    // layer 1 on level-1 nodes
    g.gB1 :+= colSums(dA1n)
    g.gW1s :+= tc.x1.t * colRange(dA1n, 0, h1)
    g.gW1n :+= tc.m2.t * colRange(dA1n, h1, d1)
  }

  private def colRange(m: DenseMatrix[Double], from: Int, until: Int): DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](m.rows, until - from)
    var i = 0
    while (i < m.rows) {
      var c = from
      while (c < until) { out(i, c - from) = m(i, c); c += 1 }
      i += 1
    }
    out
  }

  private def reluBack(d: DenseMatrix[Double], a: DenseMatrix[Double]): DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](d.rows, d.cols)
    var i = 0
    while (i < d.rows) {
      var c = 0
      while (c < d.cols) { if (a(i, c) > 0) out(i, c) = d(i, c); c += 1 }
      i += 1
    }
    out
  }

  private def spreadBlocks(m: DenseMatrix[Double], k: Int): DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](m.rows * k, m.cols)
    var i = 0
    while (i < m.rows) {
      var j = 0
      while (j < k) {
        var c = 0
        while (c < m.cols) { out(i * k + j, c) = m(i, c) / k; c += 1 }
        j += 1
      }
      i += 1
    }
    out
  }

  private def colSums(m: DenseMatrix[Double]): DenseVector[Double] = {
    val out = DenseVector.zeros[Double](m.cols)
    var i = 0
    while (i < m.rows) {
      var c = 0
      while (c < m.cols) { out(c) += m(i, c); c += 1 }
      i += 1
    }
    out
  }

  // ---- training (G8: Adam + BCE) ----
  /** One gradient step on a batch; returns mean BCE loss. */
  private[ml] def trainBatch(src: Array[Long], dst: Array[Long], labels: Array[Int],
                             rng: java.util.Random): Double = {
    val b = src.length
    val tcS = forwardTower(src, rng, train = true)
    val tcD = forwardTower(dst, rng, train = true)
    var loss = 0.0
    val dEmbS = DenseMatrix.zeros[Double](b, d2)
    val dEmbD = DenseMatrix.zeros[Double](b, d2)
    var i = 0
    while (i < b) {
      var z = 0.0; var c = 0
      while (c < d2) { z += tcS.emb(i, c) * tcD.emb(i, c); c += 1 }
      val s = 1.0 / (1.0 + math.exp(-z))
      val y = labels(i)
      loss -= (y * math.log(math.max(s, 1e-12)) + (1 - y) * math.log(math.max(1 - s, 1e-12)))
      val dz = (s - y) / b   // BCE+sigmoid combined, mean reduction
      c = 0
      while (c < d2) {
        dEmbS(i, c) = dz * tcD.emb(i, c)
        dEmbD(i, c) = dz * tcS.emb(i, c)
        c += 1
      }
      i += 1
    }
    val g = new Grads
    backwardTower(tcS, dEmbS, g)
    backwardTower(tcD, dEmbD, g)
    adamStep(g)
    loss / b
  }

  private[ml] def computeGrads(src: Array[Long], dst: Array[Long], labels: Array[Int],
                               rng: java.util.Random): (Double, Seq[Array[Double]]) = {
    // gradient-check hook: same math as trainBatch without the update
    val b = src.length
    val tcS = forwardTower(src, rng, train = true)
    val tcD = forwardTower(dst, rng, train = true)
    var loss = 0.0
    val dEmbS = DenseMatrix.zeros[Double](b, d2)
    val dEmbD = DenseMatrix.zeros[Double](b, d2)
    var i = 0
    while (i < b) {
      var z = 0.0; var c = 0
      while (c < d2) { z += tcS.emb(i, c) * tcD.emb(i, c); c += 1 }
      val s = 1.0 / (1.0 + math.exp(-z))
      val y = labels(i)
      loss -= (y * math.log(math.max(s, 1e-12)) + (1 - y) * math.log(math.max(1 - s, 1e-12)))
      val dz = (s - y) / b
      c = 0
      while (c < d2) { dEmbS(i, c) = dz * tcD.emb(i, c); dEmbD(i, c) = dz * tcS.emb(i, c); c += 1 }
      i += 1
    }
    val g = new Grads
    backwardTower(tcS, dEmbS, g)
    backwardTower(tcD, dEmbD, g)
    (loss / b, Seq(rowMajor(g.gW1s), rowMajor(g.gW1n), g.gB1.toArray,
      rowMajor(g.gW2s), rowMajor(g.gW2n), g.gB2.toArray))
  }

  private def rowMajor(m: DenseMatrix[Double]): Array[Double] = {
    val out = new Array[Double](m.rows * m.cols)
    var r = 0
    while (r < m.rows) { var c = 0; while (c < m.cols) { out(r * m.cols + c) = m(r, c); c += 1 }; r += 1 }
    out
  }

  private def adamStep(g: Grads): Unit = {
    adamT += 1
    val lr = hp.learningRate * math.sqrt(1 - math.pow(beta2, adamT)) / (1 - math.pow(beta1, adamT))
    val mats = Array((w1s, g.gW1s, 0), (w1n, g.gW1n, 1), (w2s, g.gW2s, 2), (w2n, g.gW2n, 3))
    mats.foreach { case (w, gw, idx) =>
      val m = adamM(idx); val v = adamV(idx)
      var r = 0
      while (r < w.rows) {
        var c = 0
        while (c < w.cols) {
          val grad = gw(r, c)
          m(r, c) = beta1 * m(r, c) + (1 - beta1) * grad
          v(r, c) = beta2 * v(r, c) + (1 - beta2) * grad * grad
          w(r, c) -= lr * m(r, c) / (math.sqrt(v(r, c)) + adamEps)
          c += 1
        }
        r += 1
      }
    }
    val vecs = Array((b1, g.gB1, 0), (b2, g.gB2, 1))
    vecs.foreach { case (bvec, gb, idx) =>
      val m = adamMb(idx); val v = adamVb(idx)
      var c = 0
      while (c < bvec.length) {
        val grad = gb(c)
        m(c) = beta1 * m(c) + (1 - beta1) * grad
        v(c) = beta2 * v(c) + (1 - beta2) * grad * grad
        bvec(c) -= lr * m(c) / (math.sqrt(v(c)) + adamEps)
        c += 1
      }
    }
  }

  /** G8 — fit for `epochs` over the labeled link examples; returns the
    * mean loss per epoch. Shuffling and sampling are seeded.
    */
  def fit(examples: Array[(Long, Long, Int)], epochs: Int): Seq[Double] = {
    val rng = new java.util.Random(hp.seed)
    (1 to epochs).map { _ =>
      val order = shuffle(examples.indices.toArray, rng)
      var lossSum = 0.0; var nBatches = 0
      order.grouped(hp.batchSize).foreach { idxs =>
        val src = idxs.map(i => examples(i)._1)
        val dst = idxs.map(i => examples(i)._2)
        val lab = idxs.map(i => examples(i)._3)
        lossSum += trainBatch(src, dst, lab, rng)
        nBatches += 1
      }
      lossSum / math.max(nBatches, 1)
    }
  }

  private def shuffle(a: Array[Int], rng: java.util.Random): Array[Int] = {
    var i = a.length - 1
    while (i > 0) {
      val j = rng.nextInt(i + 1)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
    a
  }

  /** Link scores for examples (dropout off, seeded sampling). */
  def predict(examples: Array[(Long, Long, Int)]): Array[Double] = {
    val rng = new java.util.Random(hp.seed ^ 0x5ca1ab1eL)
    examples.grouped(hp.batchSize).flatMap { batch =>
      val tcS = forwardTower(batch.map(_._1), rng, train = false)
      val tcD = forwardTower(batch.map(_._2), rng, train = false)
      batch.indices.map { i =>
        var z = 0.0; var c = 0
        while (c < d2) { z += tcS.emb(i, c) * tcD.emb(i, c); c += 1 }
        1.0 / (1.0 + math.exp(-z))
      }
    }.toArray
  }

  /** G9 — loss / binary accuracy / precision / recall / AUC
    * (models/supervised.py:119-123's Keras metric set).
    */
  def evaluate(examples: Array[(Long, Long, Int)]): Map[String, Double] = {
    val scores = predict(examples)
    val labels = examples.map(_._3)
    var loss = 0.0; var tp = 0; var fp = 0; var tn = 0; var fn = 0
    scores.indices.foreach { i =>
      val s = scores(i); val y = labels(i)
      loss -= (y * math.log(math.max(s, 1e-12)) + (1 - y) * math.log(math.max(1 - s, 1e-12)))
      val pred = if (s >= 0.5) 1 else 0
      (pred, y) match {
        case (1, 1) => tp += 1
        case (1, 0) => fp += 1
        case (0, 0) => tn += 1
        case (0, 1) => fn += 1
      }
    }
    val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    Map(
      "loss" -> loss / math.max(scores.length, 1),
      "binary_accuracy" -> (tp + tn).toDouble / math.max(scores.length, 1),
      "precision" -> precision,
      "recall" -> recall,
      "auc" -> auc(scores, labels),
      // F1 derived client-side per evaluation (fl_client.py:132-142);
      // the reference logs "undefined" on P+R=0 — NaN is our marker.
      "f1" -> graft.functions.GraftFunctions.f1Score(precision, recall)
        .getOrElse(Double.NaN))
  }

  /** Rank-based AUC (Mann-Whitney U with tie correction). */
  private def auc(scores: Array[Double], labels: Array[Int]): Double = {
    val nPos = labels.count(_ == 1).toDouble
    val nNeg = labels.length - nPos
    if (nPos == 0 || nNeg == 0) return 0.5
    val sorted = scores.zip(labels).sortBy(_._1)
    val ranks = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
      val avg = (i + j + 2) / 2.0 // average 1-based rank of the tie group
      var t = i; while (t <= j) { ranks(t) = avg; t += 1 }
      i = j + 1
    }
    val sumPos = sorted.indices.filter(sorted(_)._2 == 1).map(ranks).sum
    (sumPos - nPos * (nPos + 1) / 2) / (nPos * nNeg)
  }

  /** G10 — embeddings for `nodes` via the encoder tower (dropout off,
    * L2-normalized, models/unsupervised.py:81-87,105-107).
    */
  def genEmbeddings(nodes: Array[Long]): Array[(Long, Array[Float])] = {
    val rng = new java.util.Random(hp.seed ^ 0x3bedd179L)
    nodes.grouped(hp.batchSize).flatMap { batch =>
      val tc = forwardTower(batch, rng, train = false)
      batch.indices.map { i =>
        val v = new Array[Float](d2)
        var c = 0; while (c < d2) { v(c) = tc.emb(i, c).toFloat; c += 1 }
        (batch(i), v)
      }
    }.toArray
  }
}
