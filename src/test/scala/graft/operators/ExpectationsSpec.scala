package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Expectations.check: hand-traced violation counts per rule class,
  * and the one-pass plan claim (all row-level rules in one aggregate —
  * exactly one scan of the input).
  */
class ExpectationsSpec extends SparkSpec {
  import Expectations._
  import spark.implicits._

  private val df = Seq(
    (1L, Some(5.0), Some("ok")),
    (2L, Some(50.0), Some("ok")),
    (2L, None, Some("BAD!")),   // dup key, null v
    (3L, Some(-1.0), None)      // below range, null s
  ).toDF("k", "v", "s")

  test("hand trace: each rule counts its own violations") {
    val got = check(df, Seq(
      NotNull("v"),
      NotNull("s"),
      InRange("v", 0.0, 10.0),  // null, 50, -1 violate
      Matches("s", "^[a-z]+$"), // "BAD!" violates; null doesn't (NotNull's job)
      Unique(Seq("k"))))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("not_null(v)") === ((1L, 4L)))
    assert(got("not_null(s)") === ((1L, 4L)))
    assert(got("in_range(v,0.0,10.0)") === ((3L, 4L)))
    assert(got("matches(s)") === ((1L, 4L)))
    assert(got("unique(k)") === ((1L, 4L)))
  }

  test("Unique: null keys are exempt (ANSI UNIQUE semantics), duplicates still count") {
    // round-18 review: count(*) − countDistinct counted every null-key
    // row as a violation (countDistinct skips any-null rows) — a table
    // with unique non-null keys plus nulls must report 0
    val d = Seq(Some(1L), Some(2L), None, None)
      .toDF("k")
    val got = check(d, Seq(Unique(Seq("k"))))
      .as[(String, Long, Long)].collect().head
    assert(got === (("unique(k)", 0L, 4L)), s"null keys counted: $got")
    // a genuine duplicate among non-null keys still counts, nulls still exempt
    val d2 = Seq(Some(1L), Some(1L), None).toDF("k")
    val got2 = check(d2, Seq(Unique(Seq("k"))))
      .as[(String, Long, Long)].collect().head
    assert(got2 === (("unique(k)", 1L, 3L)))
    // multi-column: a null in ANY key column exempts the row
    val d3 = Seq((Some(1L), Some(1L)), (Some(1L), None), (Some(1L), Some(1L)))
      .toDF("a", "b")
    val got3 = check(d3, Seq(Unique(Seq("a", "b"))))
      .as[(String, Long, Long)].collect().head
    assert(got3 === (("unique(a,b)", 1L, 3L)))
  }

  test("the whole report is one aggregate pass: a single scan in the plan") {
    val plan = check(df, Seq(NotNull("v"), InRange("v", 0.0, 10.0),
        Matches("s", "x"), Unique(Seq("k"))))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("LocalTableScan"))
    assert(scans === 1, s"expected exactly one input scan:\n$plan")
  }

  test("clean data: zero violations everywhere") {
    val clean = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val got = check(clean, Seq(NotNull("v"), InRange("v", 0.0, 10.0),
        Unique(Seq("k"))))
      .select("violations").as[Long].collect()
    assert(got.toSeq === Seq(0L, 0L, 0L))
  }
}
