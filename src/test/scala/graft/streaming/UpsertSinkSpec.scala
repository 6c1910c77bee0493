package graft.streaming

import graft.SparkSpec
import graft.operators.Cdc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object UpsertSinkSpec {
  final case class Chg(k: Long, s: String, v: Double, op: String, seq: Long)
  /** q75's change-feed row shape: the orders schema + op/seq. */
  final case class OrdChg(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                          o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                          o_orderpriority: String, op: String, seq: Long)
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

  test("q75 twin: sink-streamed change feed reproduces the batch CDC apply on catalog rows") {
    // q75's EXACT change feed (same recipe over the same sf0.001
    // orders), replayed through the micro-batch sink in three
    // per-key-seq-ordered batches; the final materialized snapshot
    // must equal the oracle-checked q75 batch query row-for-row — the
    // batch ≡ stream closure on the CDC family (EventStreamSpec's
    // device, applied to the MERGE loop). Batch boundaries are chosen
    // so conflicting ops arrive in seq order (the sink's ordered-feed
    // contract); within a batch keys are disjoint or tie-free.
    import UpsertSinkSpec.OrdChg
    implicit val sq = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val base = graft.Tables(spark, dir).orders
    def chg(df: org.apache.spark.sql.DataFrame): Seq[OrdChg] =
      df.as[OrdChg].collect().toSeq
    val upd1 = chg(base.filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 999.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(1L)))
    val upd2 = chg(base.filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("op", lit("U")).withColumn("seq", lit(2L)))
    val dels = chg(base.filter(pmod(col("o_orderkey"), lit(97)) === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(1L)))
    val ins = chg(base.filter(pmod(col("o_orderkey"), lit(500)) === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("op", lit("I")).withColumn("seq", lit(1L)))

    val state = new UpsertSink(base, Seq("o_orderkey"))
    val src = MemoryStream[OrdChg]
    val q = src.toDF().writeStream.foreachBatch(state.sink)
      .outputMode("append").start()
    // seq-1 updates, then the key-disjoint deletes+inserts, then the
    // seq-2 updates (which also re-upsert the keys the deletes hit —
    // exactly what one-shot compaction resolves to: latest seq wins)
    for (batch <- Seq(upd1, dels ++ ins, upd2)) {
      src.addData(batch: _*)
      q.processAllAvailable()
    }
    q.stop()

    val want = graft.SparkEntry.queries("q75_cdc_apply")(spark, dir)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus")).as[(Long, Long, Double, String)].collect().toSet
    assert(state.current.count() === want.count())
    assert(keyed(state.current) === keyed(want),
      "streamed sink snapshot diverged from the batch q75 apply")
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
