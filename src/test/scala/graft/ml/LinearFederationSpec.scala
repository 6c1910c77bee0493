package graft.ml

import graft.SparkSpec
import graft.fed.Federation

/** The reference's protocol smoke rig, end to end: federate the toy
  * linear regression over misc/data1.csv + misc/data2.csv
  * (misc/server.py + misc/client.py ×2 — SURVEY §5.3). With equal
  * client sizes the weighted FedAvg equals the reference server's
  * unweighted np.mean (misc/server.py:50-59).
  */
class LinearFederationSpec extends SparkSpec {

  private val misc = "/root/reference/misc"

  test("two-client federated linear regression converges on the toy data") {
    val paths = Seq(s"$misc/data1.csv", s"$misc/data2.csv")
    val init = LinearModel.fromCsv(paths.head).initialize()
    val res = Federation.run(spark, paths,
      (p: String) => LinearModel.fromCsv(p),
      initial = init, rounds = 3, epochs = 2)
    // round-1 pre-fit eval = zero-weight model (loss ≈ Var[y]); final
    // eval is the converged global model — must be far better
    val lossAtStart = res.history.head.clientMetrics.map(_._2("loss")).max
    val lossAtEnd = res.finalMetrics.map(_._2("loss")).max
    assert(lossAtEnd < lossAtStart * 0.2,
      s"no convergence: $lossAtStart -> $lossAtEnd")
    assert(res.finalMetrics.map(_._1).toSet === paths.toSet)
    assert(res.history.head.totalExamples === 20000L)
  }

  test("equal-size clients: weighted FedAvg equals the unweighted mean (A2 parity)") {
    val m1 = LinearModel.fromCsv(s"$misc/data1.csv"); m1.initialize(); m1.fit(1)
    val m2 = LinearModel.fromCsv(s"$misc/data2.csv"); m2.initialize(); m2.fit(1)
    val weighted = graft.fed.FedAvg.weighted(
      Seq((m1.numExamples, m1.getWeights), (m2.numExamples, m2.getWeights)))
    val unweighted = graft.fed.FedAvg.mean(Seq(m1.getWeights, m2.getWeights))
    weighted.zip(unweighted).foreach { case (a, b) =>
      assert(a.values.toSeq === b.values.toSeq)
    }
  }

  test("single client converges toward the exact linear fit (sanity)") {
    // data1 is noiseless y = Xβ with β up to ~99 and Var[y] ≈ 31k; the
    // reference trains 200 epochs (misc/client.py:81) — 20 here is
    // enough for RMSprop(0.1) to cut MSE by >99.5%
    val m = LinearModel.fromCsv(s"$misc/data1.csv")
    m.initialize()
    val varY = m.evaluate()("loss") // zero-weight loss ≈ E[y²]
    m.fit(20)
    val metrics = m.evaluate()
    assert(metrics("loss") < varY * 0.005,
      s"MSE ${metrics("loss")} vs zero-model $varY")
  }
}
