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

  test("null ranks are excluded identically on both paths") {
    val withNulls = df.select(col("id"),
      when(col("id") % 100 === 0, lit(null)).otherwise(col("r")).as("r"))
    val k = 777L
    val exact = TopK.smallestBy(withNulls, "r", Seq("id"), k, exactCutoff = Long.MaxValue)
    val scale = TopK.smallestBy(withNulls, "r", Seq("id"), k, exactCutoff = 0L)
    assert(exact.filter(col("r").isNull).count() === 0L)
    assert(scale.select("id").as[Long].collect().toSet ===
      exact.select("id").as[Long].collect().toSet)
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

  test("perPartitionSmallestByKey: union of partition-local top-k covers every global winner") {
    val rng = new scala.util.Random(41)
    (1 to 5).foreach { _ =>
      val n = 200 + rng.nextInt(2000)
      val seed = rng.nextLong()
      val data = spark.range(0, n)
        .select(col("id"), (col("id") % 7).as("key"),
          md5(concat(lit(seed), col("id"))).as("h"))
        .repartition(9) // many partitions: the trim runs per slice
      val trimmed = TopK.perPartitionSmallestByKey(data, Seq("key"), Seq("h", "id"), 10)
        .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(0)))
      // global winners from the untrimmed data
      val want = data.collect().map(r => (r.getLong(1), r.getString(2), r.getLong(0)))
        .groupBy(_._1).values.flatMap(_.sortBy(t => (t._2, t._3)).take(10)).toSet
      // the trim output must be a SUPERSET of the winners and at most
      // k per (partition, key) — i.e. a superset that the downstream
      // window reduces to exactly `want`
      assert(want.subsetOf(trimmed.toSet), s"pre-trim dropped a global winner, seed=$seed")
      val reduced = trimmed.groupBy(_._1).values
        .flatMap(_.sortBy(t => (t._2, t._3)).take(10)).toSet
      assert(reduced === want, s"trim+retrim != global top-k, seed=$seed")
    }
  }

  test("perPartitionSmallestByKey: output bounded by k per key per partition") {
    val data = spark.range(0, 5000)
      .select(col("id"), (col("id") % 3).as("key"), col("id").as("v"))
      .repartition(8)
    val out = TopK.perPartitionSmallestByKey(data, Seq("key"), Seq("v"), 5)
    // ≤ 8 partitions × 3 keys × 5 rows
    assert(out.count() <= 8L * 3 * 5)
    // and nulls order first, like an ascending sort
    val withNulls = spark.range(0, 100)
      .select(col("id"), lit(0L).as("key"),
        when(col("id") < 3, lit(null)).otherwise(col("id")).as("v"))
      .coalesce(1)
    val kept = TopK.perPartitionSmallestByKey(withNulls, Seq("key"), Seq("v", "id"), 5)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("rankedTopKDesc equals the naive per-key window on random scores") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(42)
    // ties on purpose (scores drawn from a small set), incl. 0.0
    val rows = (0 until 3000).map(i =>
      (i.toLong % 7, rng.nextInt(40) / 8.0, i.toLong))
    val df = rows.toDF("key", "score", "id").repartition(9)
    val got = TopK.rankedTopKDesc(df, "key", "score", "id", 5)
      .select("key", "score", "id", "rank").as[(Long, Double, Long, Int)]
      .collect().toSet
    val w = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("key", "score", "id", "rank").as[(Long, Double, Long, Int)]
      .collect().toSet
    assert(got == want)
    // long scores too (the Bm25 scaled-long path)
    val dfl = rows.map { case (k, s, i) => (k, (s * 8).toLong - 20, i) }
      .toDF("key", "score", "id").repartition(4)
    val gotL = TopK.rankedTopKDesc(dfl, "key", "score", "id", 3)
      .select("key", "score", "id", "rank").as[(Long, Long, Long, Int)]
      .collect().toSet
    val wantL = dfl.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("key", "score", "id", "rank").as[(Long, Long, Long, Int)]
      .collect().toSet
    assert(gotL == wantL)
  }

  test("rankedTopKDesc excludes null and NaN scores on every partitioning") {
    // NaN = cosine of a zero-norm vector (0.0/0.0); null = missing
    // score. The heap and the window order them OPPOSITE ways, so
    // before the round-16 filter the result depended on which path a
    // row met first — pin that both are simply never candidates.
    val rows = (0 until 200).map { i =>
      val s: java.lang.Double =
        if (i % 17 == 0) Double.NaN
        else if (i % 13 == 0) null
        else (i % 9).toDouble
      (i.toLong % 3, s, i.toLong)
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("key", "score", "id").repartition(parts)
      val got = TopK.rankedTopKDesc(df, "key", "score", "id", 4)
        .select("key", "score", "id", "rank").as[(Long, Double, Long, Int)]
        .collect().toSet
      val want = rows.filter(r => r._2 != null && !r._2.isNaN)
        .groupBy(_._1).toSeq.flatMap { case (k, g) =>
          g.sortBy(r => (-r._2, r._3)).take(4).zipWithIndex
            .map { case ((key, s, id), r) => (key, s.toDouble, id, r + 1) }
        }.toSet
      assert(got == want, s"parts=$parts")
      assert(!got.exists(r => r._2.isNaN), "NaN must never rank")
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
