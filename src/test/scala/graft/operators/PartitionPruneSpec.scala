package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Hive-style date-partitioned layout (q89's fixture shape): a
  * predicate on the partition column must prune partitions at PLANNING
  * time — the scan's selected-partition count drops, other days' files
  * are never listed into tasks — and the pruned answer must equal the
  * full-scan filter.
  */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case s: FileSourceScanExec => s } ++
      (plan match {
        case a: AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case s: FileSourceScanExec => s }
        case _ => Seq.empty
      })
    assert(scans.nonEmpty, s"no FileSourceScan in:\n$plan")
    scans.head
  }

  test("partition predicate prunes partitions at planning; answer unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ppart-").toString
    val rows = (0 until 1000).map { i =>
      (i.toLong, java.sql.Date.valueOf(s"2024-01-${1 + i % 10}"), (i % 7).toDouble)
    }.toDF("id", "event_date", "value")
    rows.repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val ev = spark.read.parquet(dir)
    val pruned = ev.filter(col("event_date") <= lit(java.sql.Date.valueOf("2024-01-03")))
    val scan = scanOf(pruned)
    // pruning is visible in the scan's partition filters AND its
    // selected-partition count: 3 of 10 day directories survive
    assert(scan.partitionFilters.nonEmpty, "no partition filters on the scan")
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size === 3)

    val full = scanOf(ev)
    assert(full.relation.location.listFiles(Nil, Nil).size === 10)

    // answer parity with the unpartitioned filter
    val got = pruned.groupBy(col("event_date")).agg(sum(col("value")).as("s"))
      .as[(java.sql.Date, Double)].collect().toMap
    val want = rows.filter(col("event_date") <= lit(java.sql.Date.valueOf("2024-01-03")))
      .groupBy(col("event_date")).agg(sum(col("value")).as("s"))
      .as[(java.sql.Date, Double)].collect().toMap
    assert(got === want)
    assert(got.size === 3)
  }

  test("one file per day partition under the repartition-by-key write") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ppart1f-").toString
    val rows = (0 until 300).map { i =>
      (i.toLong, java.sql.Date.valueOf(s"2024-02-${1 + i % 3}"), i.toDouble)
    }.toDF("id", "event_date", "value")
    rows.repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(dir)
    val perDay = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("event_date="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap
    assert(perDay.size === 3)
    assert(perDay.values.forall(_ === 1), s"expected 1 file/day, got $perDay")
  }
}
