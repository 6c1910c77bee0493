package graft.fed

import graft.SparkSpec
import graft.sources.LayerTensor

/** The SQL-visible FedAvg Aggregator must agree with the driver-side
  * fold on every input, under any partitioning (the distributed merge
  * path is exercised by spreading updates across partitions).
  */
class FedAvgAggregatorSpec extends SparkSpec {

  private def tensor(layer: Int, vs: Float*) =
    LayerTensor(layer, Seq(vs.length), vs.toArray)

  private val updates: Seq[(Long, Seq[LayerTensor])] = Seq(
    (2L, Seq(tensor(0, 1f, 2f), tensor(1, 10f))),
    (6L, Seq(tensor(0, 3f, 6f), tensor(1, 30f))),
    (4L, Seq(tensor(0, 0f, -3f), tensor(1, 0f))))

  test("typed aggregation equals the driver-side FedAvg fold") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.kryo[(Long, Seq[LayerTensor])]
    val ds = spark.createDataset(updates).repartition(3)
    val got = ds.select(FedAvgAggregator.column).head()
    val want = FedAvg.weighted(updates)
    got.zip(want).foreach { case (g, w) =>
      assert(g.layer === w.layer && g.shape === w.shape)
      g.values.zip(w.values).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6f, s"layer ${g.layer}: $a vs $b")
      }
    }
  }

  test("hand-computed value: sum(n*w)/sum(n)") {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.kryo[(Long, Seq[LayerTensor])]
    val ds = spark.createDataset(updates.take(2)).repartition(2)
    val got = ds.select(FedAvgAggregator.column).head()
    // (2*[1,2] + 6*[3,6]) / 8 = [2.5, 5.0]; (2*10 + 6*30)/8 = 25
    assert(got.head.values.toSeq === Seq(2.5f, 5.0f))
    assert(got(1).values.toSeq === Seq(25f))
  }
}
