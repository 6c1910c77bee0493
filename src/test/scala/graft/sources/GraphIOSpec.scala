package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphIOSpec extends SparkSpec {
  import spark.implicits._

  private val refData = "/root/reference/data"

  test("whitespace edge scan reads the raw localstore fixture") {
    val e = GraphIO.readWhitespaceEdges(spark, s"$refData/4_0")
    assert(e.count() === 2734L)
    assert(e.columns.toSeq === Seq("source", "target"))
    val first = e.orderBy("source", "target").head()
    assert(first.getLong(0) === 35L)
  }

  test("whitespace attribute scan drops the trailing label column") {
    val n = GraphIO.readWhitespaceAttributes(spark, s"$refData/4_attributes_0")
    assert(n.count() === 1359L)
    val row = n.filter(col("id") === 35L).head()
    val feats = row.getSeq[Float](1)
    assert(feats.length === 1433)
    assert(feats.forall(f => f == 0.0f || f == 1.0f))
  }

  test("attribute scan with label keeps the class string") {
    val n = GraphIO.readWhitespaceAttributesWithLabel(spark, s"$refData/4_attributes_0")
    val labels = n.select("label").distinct().as[String].collect().toSet
    assert(labels.contains("Neural_Networks") || labels.contains("Genetic_Algorithms"))
    assert(labels.forall(_.nonEmpty))
  }

  test("canonical edge CSV scan matches schema and rows") {
    val e = GraphIO.readEdgesCsv(spark, s"$refData/4_edges_0.csv")
    assert(e.count() === 2837L)
    assert(e.schema.fields.map(_.dataType).forall(_ == org.apache.spark.sql.types.LongType))
  }

  test("canonical node CSV scan reads merge output (data4 fixture)") {
    val n = GraphIO.readNodesCsv(spark, "/root/reference/data4/3_nodes_1.csv")
    assert(n.count() === 697L)
    assert(n.select(size(col("features"))).head().getInt(0) === 1433)
  }

  test("embeddings CSV sink/source round-trip with pandas-style header") {
    val dir = java.nio.file.Files.createTempDirectory("embio").toString
    val emb = Seq((1L, Seq(0.5f, -1.25f, 2.0f)), (2L, Seq(1.0f, 0.0f, 3.5f)))
      .toDF("id", "embedding")
    GraphIO.writeEmbeddingsCsv(emb, s"$dir/embeddings_nograd_9_0.csv", dim = 3)
    val header = scala.io.Source.fromFile(s"$dir/embeddings_nograd_9_0.csv").getLines().next()
    assert(header === ",0,1,2")
    val back = GraphIO.readEmbeddingsCsv(spark, s"$dir/embeddings_nograd_9_0.csv", dim = 3)
      .orderBy("id").as[(Long, Seq[Float])].collect()
    assert(back === Array((1L, Seq(0.5f, -1.25f, 2.0f)), (2L, Seq(1.0f, 0.0f, 3.5f))))
  }

  test("weights parquet round-trip preserves layer order, shape, values") {
    val dir = java.nio.file.Files.createTempDirectory("wio").toString
    val w = Seq(
      LayerTensor(0, Seq(2, 3), Array(1f, 2f, 3f, 4f, 5f, 6f)),
      LayerTensor(1, Seq(3), Array(0.5f, -0.5f, 0f)))
    WeightsIO.save(spark, w, s"$dir/weights_4_0.parquet")
    val back = WeightsIO.load(spark, s"$dir/weights_4_0.parquet")
    assert(back.map(_.layer) === Seq(0, 1))
    assert(back.head.shape === Seq(2, 3))
    assert(back.head.values.toSeq === Seq(1f, 2f, 3f, 4f, 5f, 6f))
    assert(back(1).values.toSeq === Seq(0.5f, -0.5f, 0f))
  }

  test("parquet catalog: partitioned write, pruned read, dynamic overwrite") {
    val root = java.nio.file.Files.createTempDirectory("graph-pq").toString
    import spark.implicits._
    val n0 = Seq((1L, Seq(1f, 2f)), (2L, Seq(3f, 4f))).toDF("id", "features")
    val e0 = Seq((1L, 2L)).toDF("source", "target")
    val n1 = Seq((9L, Seq(9f, 9f))).toDF("id", "features")
    val e1 = Seq((9L, 9L)).toDF("source", "target")
    GraphIO.writeGraphParquet(n0, e0, root, "4", "0")
    GraphIO.writeGraphParquet(n1, e1, root, "4", "1")
    val (rn0, re0) = GraphIO.readGraphParquet(spark, root, "4", "0")
    assert(rn0.count() === 2 && re0.count() === 1)
    assert(rn0.schema.fieldNames.toSeq === Seq("id", "features"))
    // partition pruning reaches the scan
    val plan = rn0.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("partition_id"),
      s"no partition pruning:\n$plan")
    // dynamic overwrite of p0 must not clobber p1
    GraphIO.writeGraphParquet(n0, e0, root, "4", "0")
    val (rn1, _) = GraphIO.readGraphParquet(spark, root, "4", "1")
    assert(rn1.count() === 1)
  }
}
