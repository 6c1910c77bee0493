package graft.streaming

import graft.SparkSpec
import graft.operators.Cdc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object UpsertSinkSpec {
  final case class Chg(k: Long, s: String, v: Double, op: String, seq: Long)
}

/** The streaming MERGE loop: a change feed drained through
  * UpsertSink.foreachBatch must materialize exactly the snapshot the
  * batch `Cdc.applyChanges` folds produce, across micro-batch
  * boundaries, and the snapshot's lineage must stay capped.
  */
class UpsertSinkSpec extends SparkSpec {
  import UpsertSinkSpec.Chg
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "s", "v")

  private def snapOf(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, Double)].collect().toSet

  test("streamed change feed materializes the batch-fold snapshot across micro-batches") {
    implicit val sq = spark.sqlContext
    val batch1 = Seq(Chg(2, "B", 22.0, "U", 1L), Chg(4, "d", 40.0, "I", 1L))
    val batch2 = Seq(Chg(3, "c", 30.0, "D", 1L), Chg(4, "D2", 44.0, "U", 1L))

    val state = new UpsertSink(base, Seq("k"))
    val src = MemoryStream[Chg]
    val q = src.toDF().writeStream.foreachBatch(state.sink)
      .outputMode("append").start()
    src.addData(batch1: _*)
    q.processAllAvailable()
    // mid-stream snapshot equals one batch fold
    assert(snapOf(state.current) ===
      snapOf(Cdc.applyChanges(base, batch1.toDF(), Seq("k"))))
    src.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val want = Cdc.applyChanges(
      Cdc.applyChanges(base, batch1.toDF(), Seq("k")), batch2.toDF(), Seq("k"))
    assert(snapOf(state.current) === snapOf(want))
    assert(snapOf(state.current) ===
      Set((1L, "a", 10.0), (2L, "B", 22.0), (4L, "D2", 44.0)))
  }

  test("lineage stays capped: N micro-batches do not accrete N joins") {
    implicit val sq = spark.sqlContext
    val state = new UpsertSink(base, Seq("k"))
    val src = MemoryStream[Chg]
    val q = src.toDF().writeStream.foreachBatch(state.sink)
      .outputMode("append").start()
    for (i <- 1 to 8) {
      src.addData(Chg(100L + i, s"x$i", i.toDouble, "I", 1L))
      q.processAllAvailable()
    }
    q.stop()
    assert(state.current.count() === 3 + 8)
    // the checkpointed snapshot's plan is a scan, not a join tower
    val plan = state.current.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"lineage accreted joins:\n$plan")
  }
}
