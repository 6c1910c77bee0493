package graft.fed

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LayerTensor

/** A1/A2 algebra (fl_server.py:60-76): hand-computed traces plus
  * seeded property checks (permutation invariance, single-client
  * identity, constant-model fixpoint, scaling invariance).
  */
class FedAvgSpec extends AnyFunSuite {

  private def w(vs: Float*): Seq[LayerTensor] =
    Seq(LayerTensor(0, Seq(vs.length), vs.toArray))

  private def rand(rng: scala.util.Random, layers: Seq[Int]): Seq[LayerTensor] =
    layers.zipWithIndex.map { case (n, l) =>
      LayerTensor(l, Seq(n), Array.fill(n)(rng.nextFloat() * 10 - 5))
    }

  test("hand-computed 2-client weighted trace (FIXTURES-style)") {
    // clients: n=2 with W=[1,3]; n=6 with W=[5,7]
    // FedAvg = (2*[1,3] + 6*[5,7]) / 8 = [4, 6]
    val out = FedAvg.weighted(Seq((2L, w(1, 3)), (6L, w(5, 7))))
    assert(out.head.values.toSeq === Seq(4f, 6f))
  }

  test("single-client identity") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val m = rand(rng, Seq(4, 7))
      val out = FedAvg.weighted(Seq((rng.nextInt(1000) + 1L, m)))
      out.zip(m).foreach { case (a, b) =>
        a.values.zip(b.values).foreach { case (x, y) => assert(math.abs(x - y) < 1e-5f) }
      }
    }
  }

  test("permutation invariance") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val updates = (1 to 5).map(_ => (rng.nextInt(100) + 1L, rand(rng, Seq(6, 3))))
      val a = FedAvg.weighted(updates)
      val b = FedAvg.weighted(rng.shuffle(updates))
      a.zip(b).foreach { case (x, y) =>
        x.values.zip(y.values).foreach { case (u, v) => assert(math.abs(u - v) < 1e-4f) }
      }
    }
  }

  test("identical models are a fixpoint regardless of weights n_i") {
    val rng = new scala.util.Random(3)
    val m = rand(rng, Seq(5))
    val out = FedAvg.weighted(Seq((1L, m), (99L, m), (1000L, m)))
    out.head.values.zip(m.head.values).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-4f)
    }
  }

  test("unweighted mean matches numpy-style axis-0 mean") {
    // np.mean([[1,2],[3,4],[5,6]], axis=0) = [3,4]
    val out = FedAvg.mean(Seq(w(1, 2), w(3, 4), w(5, 6)))
    assert(out.head.values.toSeq === Seq(3f, 4f))
  }

  test("layer shape mismatch is rejected") {
    intercept[IllegalArgumentException] {
      FedAvg.weighted(Seq((1L, w(1, 2)), (1L, Seq(LayerTensor(0, Seq(3), Array(1f, 2f, 3f))))))
    }
  }

  test("zero clients / zero examples are rejected") {
    intercept[IllegalArgumentException](FedAvg.weighted(Nil))
    intercept[IllegalArgumentException](FedAvg.weighted(Seq((0L, w(1)))))
  }
}
