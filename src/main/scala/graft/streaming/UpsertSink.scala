package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Cdc

/** Micro-batch CDC UPSERT sink — the streaming MERGE loop every
  * lakehouse table runs: a change feed (base schema + op/seq columns,
  * `Cdc.applyChanges`' contract) drains through `foreachBatch`, and
  * each micro-batch folds into the maintained snapshot with one
  * key anti-join + union.
  *
  * Scale/lineage: the snapshot is re-materialized (`localCheckpoint`)
  * after every fold — without it the plan accretes one join per
  * micro-batch and the job dies of lineage depth, the classic
  * streaming-merge failure; a cluster deployment swaps the
  * checkpoint for a parquet/manifest rewrite (`Layout.compact` +
  * `Manifest` maintain the files, `Cdc.applyChanges` stays the merge).
  * Batches arrive ordered per query contract; within a batch the seq
  * column orders conflicting changes (latest wins).
  *
  * Usage:
  * {{{
  *   val state = new UpsertSink(base, Seq("k"))
  *   changes.writeStream.foreachBatch(state.sink).start()
  *   ... state.current  // the live snapshot
  * }}}
  */
final class UpsertSink(init: DataFrame, keys: Seq[String],
                       opCol: String = "op", seqCol: String = "seq") {
  @volatile private var snap: DataFrame = init.localCheckpoint()

  /** The current materialized snapshot (thread-safe read). */
  def current: DataFrame = snap

  /** The foreachBatch function: folds one change micro-batch into the
    * snapshot. Synchronized — micro-batches are sequential per query,
    * but `current` readers race the swap, and the checkpoint must
    * complete before the next fold reads `snap`.
    */
  def sink: (DataFrame, Long) => Unit = (batch: DataFrame, _: Long) =>
    synchronized {
      snap = Cdc.applyChanges(snap, batch, keys, opCol, seqCol).localCheckpoint()
    }
}
