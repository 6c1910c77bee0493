package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TopK.smallestBy: both physical paths (orderBy+limit vs threshold +
  * distributed trim) must produce the identical exact result.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = spark.range(0, 50000)
    .select(col("id"), xxhash64(lit(3L), col("id")).as("r"))
    .cache()

  test("scale path equals the exact path, row for row") {
    val k = 4321L
    val exact = TopK.smallestBy(df, "r", Seq("id"), k, exactCutoff = Long.MaxValue)
      .select("id").as[Long].collect().toSet
    val scale = TopK.smallestBy(df, "r", Seq("id"), k, exactCutoff = 0L)
      .select("id").as[Long].collect().toSet
    assert(exact.size === k)
    assert(scale === exact)
  }

  test("k >= n returns everything; k = 0 returns nothing") {
    assert(TopK.smallestBy(df, "r", Seq("id"), 60000L, exactCutoff = 0L).count() === 50000L)
    assert(TopK.smallestBy(df, "r", Seq("id"), 0L).count() === 0L)
  }

  test("property: both paths equal sorted-take-k for random sizes and ks") {
    val rng = new scala.util.Random(99)
    (1 to 10).foreach { _ =>
      val n = 1 + rng.nextInt(3000)
      val k = rng.nextInt(3500)
      val seed = rng.nextLong()
      val data = spark.range(0, n)
        .select(col("id"), xxhash64(lit(seed), col("id")).as("r"))
      val want = data.collect().map(r => (r.getLong(1), r.getLong(0)))
        .sorted.take(k).map(_._2).toSet
      val exact = TopK.smallestBy(data, "r", Seq("id"), k, exactCutoff = Long.MaxValue)
        .select("id").as[Long].collect().toSet
      val scale = TopK.smallestBy(data, "r", Seq("id"), k, exactCutoff = 0L)
        .select("id").as[Long].collect().toSet
      assert(exact === want, s"exact path n=$n k=$k seed=$seed")
      assert(scale === want, s"scale path n=$n k=$k seed=$seed")
    }
  }

  test("tie-break makes duplicate ranks deterministic on both paths") {
    val ties = spark.range(0, 1000)
      .select(col("id"), (col("id") % 10).as("r")).cache()
    val a = TopK.smallestBy(ties, "r", Seq("id"), 250L, exactCutoff = Long.MaxValue)
      .select("id").as[Long].collect().sorted
    val b = TopK.smallestBy(ties, "r", Seq("id"), 250L, exactCutoff = 0L)
      .select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
    ties.unpersist()
  }
}
