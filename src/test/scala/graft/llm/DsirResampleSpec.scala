package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the seeded Gumbel resampling step (q198 — Xie et al. 2023's
  * actual stochastic selection; Gumbel-top-k per Kool et al. 2019):
  * key construction bounds + determinism, seed sensitivity, and the
  * T→0 convergence of [[Dsir.resampleTopFraction]] to the
  * deterministic [[Dsir.selectTopFraction]] cut.
  */
class DsirResampleSpec extends SparkSpec {
  import spark.implicits._

  /** Planted scored frame: 40 docs, well-separated distinct scores
    * (Δ = 1.0 ≫ the ≈26-wide Gumbel noise span once divided by a
    * small T).
    */
  private lazy val scored = (1L to 40L)
    .map(i => (i, 3L, (i * 17 % 41).toDouble)) // 17 ⊥ 41 → a permutation
    .toDF("doc_id", "n_tokens", "score")

  test("gumbel keys are deterministic per (seed, id) and noise is bounded") {
    val k1 = Dsir.gumbelKeys(scored, seed = 7L, temperature = 1.0)
      .orderBy("doc_id").collect()
    val k2 = Dsir.gumbelKeys(scored, seed = 7L, temperature = 1.0)
      .orderBy("doc_id").collect()
    assert(k1.toSeq == k2.toSeq) // no RNG state anywhere
    // noise = gkey − score/T must sit inside the 32-bit construction's
    // analytic span: u ∈ (2^-33, 1 − 2^-33) → −ln(−ln u) ∈ (−3.2, 22.9)
    k1.foreach { r =>
      val noise = r.getDouble(2) - r.getDouble(1)
      assert(noise > -3.2 && noise < 22.9, s"noise $noise out of span")
    }
  }

  test("different seeds select different sets on a flat-score corpus") {
    // all scores equal → selection is PURELY noise-driven; 40 choose 8
    // under two independent seeds colliding is ~impossible
    val flat = (1L to 40L).map(i => (i, 1L, 0.0))
      .toDF("doc_id", "n_tokens", "score")
    def sel(seed: Long) = Dsir.resampleTopFraction(
        Dsir.gumbelKeys(flat, seed, temperature = 1.0), denom = 5)
      .select("doc_id").as[Long].collect().toSet
    val a = sel(1L); val b = sel(2L)
    assert(a.size == 8 && b.size == 8)
    assert(a != b, "two seeds selected identical sets on flat scores")
  }

  test("T→0: the resampled set converges to the deterministic top-fraction") {
    // scores are distinct with min gap 1.0; at T = 0.01 the score term
    // separates any two docs by ≥ 100 ≫ the ≈26-wide noise span, so
    // the key order equals the score order and the SET equals
    // selectTopFraction's (ranks may permute only within score ties —
    // none here).
    val det = Dsir.selectTopFraction(scored, denom = 5)
      .select("doc_id").as[Long].collect().toSet
    val res = Dsir.resampleTopFraction(
        Dsir.gumbelKeys(scored, seed = 42L, temperature = 0.01), denom = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(res == det)
  }

  test("at moderate T the selection genuinely diverges from the deterministic cut") {
    // same corpus, T = 20: score gaps (≤ 40) shrink to ≤ 2 against the
    // ≈26-wide noise — the stochastic step must now matter (this is
    // the property that makes q198 a different operator from q174)
    val det = Dsir.selectTopFraction(scored, denom = 5)
      .select("doc_id").as[Long].collect().toSet
    val res = Dsir.resampleTopFraction(
        Dsir.gumbelKeys(scored, seed = 42L, temperature = 20.0), denom = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(res.size == det.size)
    assert(res != det, "T=20 resampling reproduced the deterministic cut")
  }

  test("ranked output contract: (id, rank, gkey), rank dense from 1") {
    val out = Dsir.resampleTopFraction(
      Dsir.gumbelKeys(scored, seed = 42L, temperature = 1.0), denom = 5)
    assert(out.columns.toSeq == Seq("doc_id", "rank", "gkey"))
    val ranks = out.select("rank").as[Long].collect().sorted.toSeq
    assert(ranks == (1L to 8L))
  }

  /** Planted scores are distinct by construction — the convergence
    * test's precondition; guard it against future edits.
    */
  test("planted corpus precondition: distinct scores") {
    val n = scored.select("score").distinct().count()
    assert(n == 40, s"expected 40 distinct scores, got $n")
  }

  test("keys beyond the 2^53 nano-exact range fail LOUDLY, not silently") {
    // a too-small temperature pushes |score/T| past GumbelKeyBound —
    // past that, Spark and DuckDB ROUND(gkey·1e9) re-keys can disagree
    // by 1 ulp and silently flip ranks near the cut; the guard must
    // point at the violated contract instead (round-18 review)
    val ex = intercept[Exception] {
      Dsir.gumbelKeys(scored, seed = 1L, temperature = 1e-9).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("nano-exact")), s"wrong failure: $ex")
  }
}
