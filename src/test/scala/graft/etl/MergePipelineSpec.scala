package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-file parity with the reference's merge.py on its own shipped
  * fixtures (/root/reference/data, CORA 2-way split, graph_id=4).
  *
  * Expected values independently computed with pandas following
  * merge.py:14-47: partition 0 → 1451 merged nodes (1359 local + 151
  * central − 59 overlaps), 2837 edges; partition 1 → 1431 nodes, 2592
  * edges. Edge row-sets must equal the shipped canonical
  * 4_edges_{0,1}.csv exactly.
  */
class MergePipelineSpec extends SparkSpec {

  private val refData = "/root/reference/data"

  private def merged(pid: String) =
    MergePipeline.merge(spark, refData, refData, "4", pid)

  test("merge p0: node count and keep-first overlap semantics match pandas") {
    val m = merged("0")
    assert(m.nodes.count() === 1451L)
    assert(m.nodes.select("id").distinct().count() === 1451L)
  }

  test("merge p1: node count matches pandas") {
    assert(merged("1").nodes.count() === 1431L)
  }

  test("merge p0: edge row-set equals shipped canonical 4_edges_0.csv") {
    val m = merged("0")
    val canonical = graft.sources.GraphIO.readEdgesCsv(spark, s"$refData/4_edges_0.csv")
    assert(m.edges.count() === 2837L)
    // exact multiset equality both ways
    assert(m.edges.exceptAll(canonical).count() === 0L)
    assert(canonical.exceptAll(m.edges).count() === 0L)
  }

  test("merge p1: edge row-set equals shipped canonical 4_edges_1.csv") {
    val m = merged("1")
    val canonical = graft.sources.GraphIO.readEdgesCsv(spark, s"$refData/4_edges_1.csv")
    assert(m.edges.count() === 2592L)
    assert(m.edges.exceptAll(canonical).count() === 0L)
    assert(canonical.exceptAll(m.edges).count() === 0L)
  }

  test("merged node features equal the localstore attribute rows (priority)") {
    // id 35 exists in BOTH stores for p0; merge must keep the localstore
    // row (merge.py keep='first'). Features are identical across stores
    // in the fixtures, so assert against the raw attribute scan.
    val m = merged("0")
    val raw = graft.sources.GraphIO.readWhitespaceAttributes(
      spark, s"$refData/4_attributes_0")
    val got = m.nodes.filter(col("id") === 35L).select("features").head().getSeq[Float](0)
    val want = raw.filter(col("id") === 35L).select("features").head().getSeq[Float](0)
    assert(got === want)
    assert(got.length === 1433)
  }

  test("full run writes canonical CSVs that read back identically") {
    val out = java.nio.file.Files.createTempDirectory("merge-out").toString
    val m = MergePipeline.run(spark, refData, refData, out, "4", "0")
    val nodesBack = graft.sources.GraphIO.readNodesCsv(spark, s"$out/4_nodes_0.csv")
    val edgesBack = graft.sources.GraphIO.readEdgesCsv(spark, s"$out/4_edges_0.csv")
    assert(nodesBack.count() === 1451L)
    assert(edgesBack.count() === 2837L)
    assert(edgesBack.exceptAll(m.edges).count() === 0L)
    // header parity with pandas to_csv: `0,1,...,1433`
    val header = scala.io.Source.fromFile(s"$out/4_nodes_0.csv").getLines().next()
    assert(header.startsWith("0,1,2,") && header.endsWith(",1433"))
  }
}
