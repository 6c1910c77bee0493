package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity.semDedupSweep (q178): each τ row of the sweep equals an
  * independent semDedupClustered run AT that τ — the sweep is exactly
  * the per-threshold dedup verdict, computed from one shared pair
  * scan.
  */
class SemDedupSweepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus: DataFrame = {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val twins = emb
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + lit(0.005) *
            (pmod(col("vec_id") + i.cast("bigint") + 1, lit(7)) - 3).cast("double"))
          .as("embedding"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    base.unionByName(twins).localCheckpoint()
  }

  private lazy val cents =
    graft.Tables(spark, "/root/testdata/sf0.001").embeddings
      .filter(col("vec_id") < 16).localCheckpoint()

  test("each sweep row equals an independent per-tau dedup run") {
    val taus = Seq(0.95, 0.97, 0.99)
    val rows = Similarity.semDedupSweep(corpus, cents, taus,
        centroidIdCol = "vec_id")
      .as[(Double, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows.keySet === taus.toSet)
    val total = corpus.count()
    taus.foreach { tau =>
      val dropped = Similarity.semDedupClustered(corpus, cents, tau,
          centroidIdCol = "vec_id")
        .filter(!col("keep")).count()
      val (nd, nk, frac) = rows(tau)
      assert(nd === dropped, s"tau=$tau n_dropped")
      assert(nk === total - dropped, s"tau=$tau n_kept")
      val r9 = BigDecimal(dropped.toDouble / total)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(frac === r9, s"tau=$tau drop_frac")
    }
    // the planted twins sit at cosine ≈ 0.997: τ = 0.99 must still
    // drop them, so the sweep is not vacuously zero anywhere
    assert(rows(0.99)._1 > 0)
    // monotone: lowering τ can only drop MORE
    assert(rows(0.95)._1 >= rows(0.97)._1 &&
      rows(0.97)._1 >= rows(0.99)._1)
  }
}
