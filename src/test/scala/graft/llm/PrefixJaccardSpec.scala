package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filter exact set-similarity join (NearDup.prefixJaccardPairs):
  * the pair set must EQUAL the O(n²) exact oracle — completeness is a
  * theorem (any qualifying pair shares a rarest-first prefix shingle),
  * precision is the verify join — across thresholds and corpus shapes.
  */
class PrefixJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(nBase: Int, docLen: Int = 40, seed: Int = 7): DataFrame = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    val rng = new scala.util.Random(seed)
    val base = (0 until nBase).map { i =>
      (i.toLong, Array.fill(docLen)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val dups = base.filter(_._1 % 4 == 0).map { case (id, text) =>
      val toks = text.split(" ")
      toks(rng.nextInt(toks.length)) = "REPLACED"
      (id + 100000L, toks.mkString(" "))
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet

  test("pair set equals the exact all-pairs oracle at several thresholds") {
    val df = corpus(60).cache()
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val exact = pairsOf(NearDup.exactJaccardPairs(df, "doc_id", "text", t))
      val pf = pairsOf(NearDup.prefixJaccardPairs(df, "doc_id", "text", t))
      assert(pf === exact, s"threshold $t: prefix ${pf.size} vs exact ${exact.size}")
      if (t <= 0.7)
        assert(exact.nonEmpty, s"threshold $t: oracle unexpectedly empty")
    }
    df.unpersist()
  }

  test("threshold 1.0 finds exactly the identical-shingle-set pairs") {
    val df = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"),     // identical
      (3L, "a b c d e f a b c d e f"),              // same distinct 3-gram set? no — wraps add shingles
      (4L, "z y x w v u")
    ).toDF("doc_id", "text")
    val pf = pairsOf(NearDup.prefixJaccardPairs(df, "doc_id", "text", 1.0))
    val exact = pairsOf(NearDup.exactJaccardPairs(df, "doc_id", "text", 1.0))
    assert(pf === exact)
    assert(pf.map(p => (p._1, p._2)).contains((1L, 2L)))
  }

  test("docs with fewer than n tokens never pair, never crash") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, ""), (4L, "x y z w")).toDF("doc_id", "text")
    val pf = NearDup.prefixJaccardPairs(df, "doc_id", "text", 0.5).collect()
    assert(pf.isEmpty)
  }

  test("invalid threshold rejected") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      NearDup.prefixJaccardPairs(df, "doc_id", "text", 0.0)
    }
    intercept[IllegalArgumentException] {
      NearDup.prefixJaccardPairs(df, "doc_id", "text", 1.5)
    }
  }
}
