package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the continuous validation pass a 100 TB
  * pipeline runs on every ingest (the Deequ/dbt-tests shape): declare
  * per-column constraints, get back one row per rule with its
  * violation count against the total.
  *
  * Scale shape: ALL row-level rules (null, range, regex) evaluate in a
  * single aggregate over one scan — adding a rule adds a conditional
  * sum, never a pass. Uniqueness rules ride the same aggregate as
  * `count - countDistinct` (Spark plans the distinct expansion
  * map-side; one shuffle total for the whole report). The report is
  * O(rules) rows — a driver-sized artifact to alert on.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** `col` must never be null. */
  final case class NotNull(c: String) extends Rule {
    def name = s"not_null($c)"
  }
  /** `col` must be non-null and within [lo, hi]. */
  final case class InRange(c: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($c,$lo,$hi)"
  }
  /** Non-null values of `col` must match `regex` (nulls: use NotNull). */
  final case class Matches(c: String, regex: String) extends Rule {
    def name = s"matches($c)"
  }
  /** `cols` must be unique across the table. Violations = extra copies
    * among FULLY NON-NULL keys (rows with any null key column are
    * exempt — the ANSI UNIQUE-constraint semantics; pair with NotNull
    * to forbid them. Round-18 review: `count(*) − countDistinct` counted
    * every null-key row as a violation, because countDistinct skips
    * rows with any null — a 1%-null key column alerted ~1% "duplicates"
    * on a perfectly unique table).
    */
  final case class Unique(cs: Seq[String]) extends Rule {
    def name = s"unique(${cs.mkString(",")})"
  }

  /** One row per rule: `(rule, violations, n_rows)`. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules to check")
    val measures: Seq[(String, Column)] = rules.map {
      case r @ NotNull(c) =>
        r.name -> sum(when(col(c).isNull, 1L).otherwise(0L))
      case r @ InRange(c, lo, hi) =>
        r.name -> sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L)
          .otherwise(0L))
      case r @ Matches(c, re) =>
        r.name -> sum(when(col(c).isNotNull && !col(c).rlike(re), 1L)
          .otherwise(0L))
      case r @ Unique(cs) =>
        // both terms range over fully-non-null keys: countDistinct
        // skips any-null rows by SQL semantics, so the row count must
        // apply the same restriction
        val allNN = cs.map(col(_).isNotNull).reduce(_ && _)
        r.name -> (sum(when(allNN, 1L).otherwise(0L)) -
          countDistinct(cs.head, cs.tail: _*))
    }
    val aggs = (count(lit(1)).as("__n") +:
      measures.zipWithIndex.map { case ((_, m), i) => m.as(s"__m$i") })
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(measures.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"),
          coalesce(col(s"__m$i"), lit(0L)).as("violations"),
          col("__n").as("n_rows"))
      }: _*)).as("__r"))
      .select(col("__r.rule"), col("__r.violations"), col("__r.n_rows"))
  }
}
