package graft.ml

import graft.fed.FedAvg.Weights
import graft.fed.FedModel
import graft.sources.LayerTensor

/** The reference's toy federation model (misc/client.py:66-81,
  * misc/worker.py, misc/model.py): `Dense(1, linear)` over 10 features,
  * MSE loss, RMSprop(lr=0.1), minibatch 50 — the protocol smoke rig
  * that federates `misc/data1.csv` / `misc/data2.csv` (SURVEY §5.3).
  *
  * Weights cross the FedModel boundary as two tensors, Keras Dense
  * layout: (kernel [nFeatures,1], bias [1]). Training is task-local
  * Scala (one client's table fits a task by construction — 10k×11
  * doubles); the client reads its CSV directly like the reference
  * client does (`pd.read_csv("data1.csv")`, misc/client.py:77).
  */
final class LinearModel(xs: Array[Array[Double]], ys: Array[Double],
                        lr: Double = 0.1, batchSize: Int = 50,
                        seed: Long = 42L) extends FedModel {
  require(xs.nonEmpty && xs.length == ys.length)
  private val nF = xs.head.length
  private var w = new Array[Double](nF)
  private var b = 0.0
  // RMSprop state (Keras defaults rho=0.9, eps=1e-7)
  private val rho = 0.9; private val eps = 1e-7
  private var sw = new Array[Double](nF)
  private var sb = 0.0

  def numExamples: Long = xs.length.toLong

  def getWeights: Weights = Seq(
    LayerTensor(0, Seq(nF, 1), w.map(_.toFloat)),
    LayerTensor(1, Seq(1), Array(b.toFloat)))

  def setWeights(weights: Weights): Unit = {
    require(weights.length == 2 && weights(0).shape == Seq(nF, 1))
    w = weights(0).values.map(_.toDouble)
    b = weights(1).values(0).toDouble
  }

  def initialize(): Weights = { // zero init (Keras Dense bias; kernel ~0 for the rig)
    w = new Array[Double](nF); b = 0.0
    sw = new Array[Double](nF); sb = 0.0
    getWeights
  }

  def fit(epochs: Int): Weights = {
    val rng = new java.util.Random(seed)
    val idx = xs.indices.toArray
    for (_ <- 1 to epochs) {
      // Fisher-Yates shuffle, seeded
      var i = idx.length - 1
      while (i > 0) { val j = rng.nextInt(i + 1); val t = idx(i); idx(i) = idx(j); idx(j) = t; i -= 1 }
      idx.grouped(batchSize).foreach { batch =>
        val gw = new Array[Double](nF); var gb = 0.0
        batch.foreach { r =>
          val x = xs(r)
          var pred = b; var c = 0
          while (c < nF) { pred += w(c) * x(c); c += 1 }
          val d = 2.0 * (pred - ys(r)) / batch.length // d MSE / d pred
          c = 0; while (c < nF) { gw(c) += d * x(c); c += 1 }
          gb += d
        }
        var c = 0
        while (c < nF) {
          sw(c) = rho * sw(c) + (1 - rho) * gw(c) * gw(c)
          w(c) -= lr * gw(c) / (math.sqrt(sw(c)) + eps)
          c += 1
        }
        sb = rho * sb + (1 - rho) * gb * gb
        b -= lr * gb / (math.sqrt(sb) + eps)
      }
    }
    getWeights
  }

  def evaluate(): Map[String, Double] = {
    var se = 0.0; var ae = 0.0
    var i = 0
    while (i < xs.length) {
      var pred = b; var c = 0
      while (c < nF) { pred += w(c) * xs(i)(c); c += 1 }
      val d = pred - ys(i)
      se += d * d; ae += math.abs(d)
      i += 1
    }
    Map("loss" -> se / xs.length, "mae" -> ae / xs.length)
  }
}

object LinearModel {

  /** Task-side CSV load (misc/client.py:77-79 shape: header
    * `x1..x10,y`, doubles). Plain java.io like the reference's local
    * pandas read — no Spark in the task.
    */
  def fromCsv(path: String, lr: Double = 0.1, batchSize: Int = 50,
              seed: Long = 42L): LinearModel = {
    val src = scala.io.Source.fromFile(path)
    try {
      val lines = src.getLines()
      val header = lines.next().split(',')
      val nF = header.length - 1
      val xs = Array.newBuilder[Array[Double]]
      val ys = Array.newBuilder[Double]
      lines.filter(_.nonEmpty).foreach { line =>
        val t = line.split(',')
        xs += t.take(nF).map(_.toDouble)
        ys += t(nF).toDouble
      }
      new LinearModel(xs.result(), ys.result(), lr, batchSize, seed)
    } finally src.close()
  }
}
