package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Enforcement closes the audit: every released (cell, width) group
  * must hold ≥ k rows (the post-suppression audit returns zero rows),
  * escalation and suppression actually fire, values stay inside their
  * released bucket, and the output is partitioning-deterministic.
  */
class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  // crafted corpus: cell (en, web) dense at fine width; (de, web)
  // qualifies only at width 500; (zh, api) never reaches 5 → suppress
  private lazy val rows =
    (0 until 8).map(i => (i.toLong, "en", "web", 110L + i)) ++          // fine cell [100,200)
      (0 until 5).map(i => (100L + i, "de", "web", (i * 90).toLong)) ++ // spread over fine cells, one 500-cell
      (0 until 3).map(i => (200L + i, "zh", "api", 10000L + i * 3000))  // 3 rows, 3 distinct 2000-cells
  private lazy val df = rows.toDF("doc_id", "lang", "source", "n_chars")
  private lazy val out = KAnonymity.enforce(df.repartition(5),
    Seq("lang", "source"), "n_chars", widths = Seq(100L, 500L, 2000L), k = 5L).cache()

  test("post-suppression audit returns zero rows: every released cell has >= k members") {
    val viol = out.groupBy("lang", "source", "bucket_lo", "bucket_width")
      .agg(count(lit(1)).as("n")).filter(col("n") < 5)
    assert(viol.count() === 0L)
  }

  test("escalation ladder and suppression fire as constructed") {
    val got = out.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("bucket_lo"), r.getAs[Long]("bucket_width"))).toSet
    // en/web: all 8 in the 100-wide [100,200) cell
    (0L until 8L).foreach(i => assert(got.contains((i, 100L, 100L)), s"en $i"))
    // de/web: values 0,90,180,270,360 — fine cells singleton, 500-cell holds all 5
    (100L until 105L).foreach(i => assert(got.exists(t => t._1 == i && t._3 == 500L), s"de $i"))
    // zh/api: 3 rows spread across distinct cells at every width → suppressed
    assert(!got.exists(_._1 >= 200L))
    assert(out.count() === 13L) // 8 + 5 released, 3 suppressed
  }

  test("released values lie inside their generalized bucket") {
    val bad = out // enforce keeps all input columns, n_chars included
      .filter(col("n_chars") < col("bucket_lo") ||
        col("n_chars") >= col("bucket_lo") + col("bucket_width"))
    assert(bad.count() === 0L)
  }

  test("deterministic under partitioning") {
    val b = KAnonymity.enforce(df.repartition(2),
      Seq("lang", "source"), "n_chars", Seq(100L, 500L, 2000L), k = 5L)
      .collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet === b)
  }

  test("negative quasi values: released bucket CONTAINS the value (floor, not truncate)") {
    // round-18 review: `div` truncates toward zero, so -15 bucketed at
    // width 10 claimed [-10, 0) — an interval that excludes it — and
    // values -9..9 collapsed into one 19-wide cell labeled width 10.
    // Floor bucketing puts -15 in [-20, -10) and keeps cells honest.
    val neg = (0 until 6).map(i => (i.toLong, "en", "web", -15L - i)) ++ // all in [-20,-10)
      (0 until 6).map(i => (50L + i, "en", "web", 5L + i % 5))           // all in [0,10)
    val rel = KAnonymity.enforce(neg.toDF("doc_id", "lang", "source", "n_chars"),
      Seq("lang", "source"), "n_chars", widths = Seq(10L, 50L), k = 5L)
    val bad = rel.filter(col("n_chars") < col("bucket_lo") ||
      col("n_chars") >= col("bucket_lo") + col("bucket_width"))
    assert(bad.count() === 0L,
      s"released interval excludes its value:\n${rel.collect().mkString("\n")}")
    assert(rel.count() === 12L) // both bands qualify at some rung
  }

  test("starLadder releases rows pure suppression would drop, at the right rung") {
    // zh/api (rows 200..202, values 10000/13000/16000) dies in every
    // numeric rung; four more sub-k zh groups land in the [10000,12000)
    // 2000-cell, so the source→'*' rung pools that cell to 5 ≥ k while
    // 13000/16000 stay singletons. fr/ja groups are too small even
    // pooled by lang → only the lang→'*' rung (5 rows in cell 0)
    // rescues them. A lone oversized value in its own 2000-cell still
    // suppresses at every rung.
    val ladderRows = rows ++
      Seq((300L, "zh", "web", 10500L), (301L, "zh", "cdn", 11800L),
        (302L, "zh", "web", 10100L), (303L, "zh", "cdn", 11000L)) ++
      Seq((400L, "fr", "web", 50L), (401L, "fr", "api", 60L),
        (402L, "ja", "web", 70L), (403L, "ja", "api", 80L),
        (404L, "ja", "cdn", 90L)) ++
      Seq((500L, "ko", "web", 999999L)) // alone in its 2000-cell even starred
    val d = ladderRows.toDF("doc_id", "lang", "source", "n_chars")
    val noLadder = KAnonymity.enforce(d.repartition(3),
      Seq("lang", "source"), "n_chars", Seq(100L, 500L, 2000L), k = 5L)
    val ladder = KAnonymity.enforce(d.repartition(3),
      Seq("lang", "source"), "n_chars", Seq(100L, 500L, 2000L), k = 5L,
      starLadder = Seq("source", "lang")).cache()
    val noIds = noLadder.select("doc_id").as[Long].collect().toSet
    val byId = ladder.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[String]("source"),
          r.getAs[Long]("bucket_lo"))).toMap
    // the (zh, [10000,12000)) pool: suppressed without the ladder,
    // released at the source rung with lang preserved
    Seq(200L, 300L, 301L, 302L, 303L).foreach { i =>
      assert(!noIds.contains(i), s"row $i unexpectedly released without ladder")
      assert(byId.contains(i), s"row $i not rescued by the ladder")
      assert(byId(i)._2 === "*", s"row $i must carry source='*'")
      assert(byId(i)._1 === "zh", s"row $i keeps lang at the source rung")
      assert(byId(i)._3 === 10000L, s"row $i bucket")
    }
    // zh 13000/16000 stay singleton in their cells at EVERY rung
    Seq(201L, 202L).foreach(i => assert(!byId.contains(i), s"row $i"))
    // fr/ja rows: only the lang rung (both columns starred) rescues
    (400L to 404L).foreach { i =>
      assert(!noIds.contains(i), s"row $i unexpectedly released without ladder")
      assert(byId.contains(i), s"row $i not rescued by the lang rung")
      assert(byId(i)._1 === "*" && byId(i)._2 === "*", s"row $i fully starred")
    }
    // the lone oversized row still suppresses at every rung
    assert(!byId.contains(500L))
    // the anonymity audit holds on the GENERALIZED columns
    val viol = ladder.groupBy("lang", "source", "bucket_lo", "bucket_width")
      .agg(count(lit(1)).as("n")).filter(col("n") < 5)
    assert(viol.count() === 0L)
    // rows released by the numeric rungs are identical with and
    // without the ladder (the ladder only appends rungs)
    assert(noLadder.collect().map(_.toSeq).toSet.subsetOf(
      ladder.collect().map(_.toSeq).toSet))
  }

  test("invalid arguments rejected") {
    intercept[IllegalArgumentException](
      KAnonymity.enforce(df, Seq(), "n_chars", Seq(100L), 5L))
    intercept[IllegalArgumentException](
      KAnonymity.enforce(df, Seq("lang"), "n_chars", Seq(500L, 100L), 5L))
    intercept[IllegalArgumentException](
      KAnonymity.enforce(df, Seq("lang"), "n_chars", Seq(100L), 0L))
  }
}
