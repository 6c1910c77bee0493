package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min-sketch merge + estimate: merging per-bucket sketches must
  * EQUAL the direct single sketch (CMS cells are sums; fixed seed ⇒
  * same hash rows ⇒ deterministic), estimates never undercount, and
  * the eps × N overestimate bound holds on the events fixture.
  */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val cmsExpr = "count_min_sketch(user_id, 0.001d, 0.99d, 42)"

  private lazy val events = graft.Tables(spark, "/root/testdata/sf0.001")
    .events
    .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    .localCheckpoint()

  private def estimates(merged: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    merged
      .select(col("event_type"), col("__m"),
        explode(sequence(lit(0L), lit(19L))).as("user_id"))
      .select(col("event_type"), col("user_id"),
        CmsEstimate(col("__m"), col("user_id")).as("est"))
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("merging per-day sketches equals the direct whole-range sketch") {
    val daily = events.groupBy(col("event_type"), col("day"))
      .agg(expr(cmsExpr).as("__cms"))
    val merged = daily.groupBy(col("event_type"))
      .agg(CmsMergeAgg(col("__cms")).as("__m"))
    val direct = events.groupBy(col("event_type"))
      .agg(expr(cmsExpr).as("__m"))
    assert(estimates(merged) === estimates(direct))
  }

  test("estimates never undercount; eps bound holds vs exact counts") {
    val daily = events.groupBy(col("event_type"), col("day"))
      .agg(expr(cmsExpr).as("__cms"))
    val merged = daily.groupBy(col("event_type"))
      .agg(CmsMergeAgg(col("__cms")).as("__m"))
    val est = estimates(merged)
    val exact = events.filter(col("user_id") < 20)
      .groupBy(col("event_type"), col("user_id")).count()
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap.withDefaultValue(0L)
    val totals = events.groupBy(col("event_type")).count()
      .as[(String, Long)].collect().toMap
    assert(est.nonEmpty)
    est.foreach { case ((t, u), e) =>
      assert(e >= exact((t, u)), s"CMS undercounted ($t, $u)")
      assert(e <= exact((t, u)) + math.ceil(0.001 * totals(t)).toLong + 1,
        s"($t, $u): est $e vs exact ${exact((t, u))}, n=${totals(t)}")
    }
  }

  test("cms_merge and cms_estimate are SQL-callable (registry)") {
    // the shared test session is built without spark.sql.extensions —
    // install the extension functions into its live registry
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    org.apache.spark.sql.graftshim.ColumnShim.applyFunctionExtensions(ext,
      org.apache.spark.sql.graftshim.ColumnShim.sessionFunctionRegistry(spark))
    events.createOrReplaceTempView("cms_events")
    val row = spark.sql(
      s"""SELECT event_type,
            cms_estimate(cms_merge(__cms), CAST(0 AS BIGINT)) AS est
          FROM (SELECT event_type, day, $cmsExpr AS __cms
                FROM cms_events GROUP BY 1, 2)
          GROUP BY event_type""").collect()
    assert(row.nonEmpty)
    assert(row.forall(_.getLong(1) >= 0L))
  }
}
