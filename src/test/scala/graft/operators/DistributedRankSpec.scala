package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedRank ≡ the naive keyed window it replaces — pinned on a
  * corpus big enough that every group spans MANY range shards (the
  * regime the operator exists for), plus the rational rank-function
  * helpers against Spark's own percent_rank/cume_dist/ntile.
  */
class DistributedRankSpec extends SparkSpec {
  import spark.implicits._

  // 3 low-cardinality groups × 4000 rows, unique tiebreaker id, a
  // skewed long value; md5 order decorrelates order from generation
  private lazy val corpus: DataFrame = spark.range(12000)
    .select(col("id"),
      concat(lit("g"), pmod(col("id"), lit(3))).as("grp"),
      md5(col("id").cast("string")).as("h"),
      (pmod(col("id") * 37, lit(1000)) + lit(1)).cast("long").as("v"))
    .cache()

  test("prefix: rank, n, and running sum match the naive keyed window") {
    val naiveOrd = Window.partitionBy(col("grp")).orderBy(col("h"), col("id"))
    val naive = corpus
      .withColumn("r", row_number().over(naiveOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .withColumn("c", sum(col("v")).over(
        naiveOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("r"), col("n"), col("c"))
    val fast = DistributedRank.prefix(corpus, Seq("grp"), Seq("h", "id"),
        sumCols = Seq("v"), numShards = 16)
      .select(col("id"), col("__rank").as("r"), col("__n").as("n"),
        col("__cum_v").as("c"))
    assert(fast.join(naive, Seq("id"))
      .filter(fast("r") =!= naive("r") || fast("n") =!= naive("n") ||
        fast("c") =!= naive("c")).isEmpty,
      "prefix diverged from the naive window")
    assert(fast.count() === 12000L)
  }

  test("prefix: a group smaller than one shard and a single-shard run") {
    val tiny = corpus.filter(col("id") < 5)
    val one = DistributedRank.prefix(tiny, Seq("grp"), Seq("id"), Seq("v"),
      numShards = 1).select("id", "__rank", "__n", "__cum_v").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    // groups g0={0,3}, g1={1,4}, g2={2}: ranks restart per group
    assert(one.map(_._2).toSeq === Seq(1L, 1L, 1L, 2L, 2L))
    assert(one.map(_._3).toSeq === Seq(2L, 2L, 1L, 2L, 2L))
  }

  test("prefix: decimal running sums stay exact") {
    val d = corpus.withColumn("dv",
      col("v").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
    val naive = d.withColumn("c", sum(col("dv")).over(
        Window.partitionBy(col("grp")).orderBy(col("h"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("c"))
    val fast = DistributedRank.prefix(d, Seq("grp"), Seq("h", "id"),
        Seq("dv"), numShards = 8)
      .select(col("id"), col("__cum_dv").as("c"))
    assert(fast.join(naive, Seq("id"))
      .filter(fast("c") =!= naive("c")).isEmpty)
  }

  test("prefix: null group keys form their own group, exactly like the naive window") {
    val withNulls = corpus.withColumn("grp",
      when(pmod(col("id"), lit(7)) === 0, lit(null)).otherwise(col("grp")))
    val naiveOrd = Window.partitionBy(col("grp")).orderBy(col("h"), col("id"))
    val naive = withNulls
      .withColumn("r", row_number().over(naiveOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("grp"))))
      .withColumn("c", sum(col("v")).over(
        naiveOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("r"), col("n"), col("c"))
    val fast = DistributedRank.prefix(withNulls, Seq("grp"), Seq("h", "id"),
        Seq("v"), numShards = 8)
      .select(col("id"), col("__rank").as("r"), col("__n").as("n"),
        col("__cum_v").as("c"))
    assert(fast.count() === 12000L, "null-group rows dropped")
    assert(fast.join(naive, Seq("id"))
      .filter(fast("r") =!= naive("r") || fast("n") =!= naive("n") ||
        fast("c") =!= naive("c")).isEmpty)
  }

  test("rollingRange matches the naive RANGE frame, ties included") {
    // epochs collide heavily (div 7) so RANGE-peer semantics are exercised,
    // and chunks are small (60 s window over ~2860 s span = ~48 chunks)
    val ev = spark.range(8000).select(col("id"),
      concat(lit("t"), pmod(col("id"), lit(4))).as("typ"),
      (col("id") * 5 / 14).cast("long").as("ep"),
      (pmod(col("id") * 13, lit(100))).cast("long").as("v"))
    val naive = ev
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("typ"))
        .orderBy(col("ep")).rangeBetween(-59, 0)))
      .withColumn("s", sum(col("v")).over(Window.partitionBy(col("typ"))
        .orderBy(col("ep")).rangeBetween(-59, 0)))
      .select(col("id"), col("n"), col("s"))
    val fast = DistributedRank.rollingRange(ev, Seq("typ"), "ep", 60L, Seq("v"))
      .select(col("id"), col("__roll_n").as("n"), col("__roll_v").as("s"))
    assert(fast.count() === 8000L, "donor replicas leaked into the output")
    assert(fast.join(naive, Seq("id"))
      .filter(fast("n") =!= naive("n") || fast("s") =!= naive("s")).isEmpty,
      "rollingRange diverged from the naive RANGE window")
  }

  test("rank-function helpers equal Spark's window functions") {
    val w = Window.partitionBy(col("grp")).orderBy(col("h"), col("id"))
    // group sizes 4000 (ntile remainder 0) plus a filtered 4001/3999 mix
    for (frame <- Seq(corpus, corpus.filter(col("id") =!= 7 && col("id") =!= 11),
                      corpus.filter(col("id") < 13))) {
      val naive = frame
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("nt", ntile(10).over(w))
        .withColumn("nt3", ntile(3).over(w))
        .select(col("id"), col("pr"), col("cd"), col("nt"), col("nt3"))
      val ranked = DistributedRank.prefix(frame, Seq("grp"), Seq("h", "id"),
        numShards = 8)
      val fast = ranked.select(col("id"),
        DistributedRank.percentRankFromRank(col("__rank"), col("__n")).as("pr"),
        DistributedRank.cumeDistFromRank(col("__rank"), col("__n")).as("cd"),
        DistributedRank.ntileFromRank(col("__rank"), col("__n"), 10).as("nt"),
        DistributedRank.ntileFromRank(col("__rank"), col("__n"), 3).as("nt3"))
      assert(fast.join(naive, Seq("id"))
        .filter(fast("pr") =!= naive("pr") || fast("cd") =!= naive("cd") ||
          fast("nt") =!= naive("nt") || fast("nt3") =!= naive("nt3")).isEmpty,
        "rank helpers diverged from Spark's window functions")
    }
  }

  test("ntileFromRank handles n < buckets (one row per leading bucket)") {
    val f = corpus.filter(col("id") < 13) // group sizes 5/4/4, all < 10
    val w = Window.partitionBy(col("grp")).orderBy(col("h"), col("id"))
    val naive = f.withColumn("nt", ntile(10).over(w)).select(col("id"), col("nt"))
    val fast = DistributedRank.prefix(f, Seq("grp"), Seq("h", "id"))
      .select(col("id"),
        DistributedRank.ntileFromRank(col("__rank"), col("__n"), 10).as("nt"))
    assert(fast.join(naive, Seq("id")).filter(fast("nt") =!= naive("nt")).isEmpty)
  }
}
