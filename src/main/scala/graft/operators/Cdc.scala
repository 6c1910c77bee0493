package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge / change-data-capture application — the MERGE INTO shape of a
  * log-less lakehouse table: a base snapshot plus a batch of keyed
  * changes produce the next snapshot.
  *
  * Scale shape: both operations are ONE key-equi anti-join (the base
  * side keeps its partitioning; only keys shuffle from the change
  * side — changes are ingest-batch-sized by contract) plus a union;
  * `applyChanges` adds one change-batch-local window to compact
  * multiple changes per key. Nothing rescans or rewrites base rows
  * that didn't change keys — combine with `Layout.compact` /
  * `Manifest.appendStats` for the file-level maintenance loop.
  */
object Cdc {

  /** Upsert: matched keys take the update row wholesale, unmatched
    * update rows insert, untouched base rows survive. `updates` must
    * carry base's schema and be unique per key.
    */
  def merge(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)
  }

  /** Apply a CDC change batch (Debezium-style): `changes` = base
    * schema + `opCol` ("U"/"I" upsert, "D" delete) + `seqCol` (change
    * order, unique per key by contract). Per key the LATEST change
    * wins (earlier changes in the same batch are compacted away);
    * a winning delete removes the key, a winning upsert replaces it.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    base.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(latest.filter(col(opCol) =!= "D")
        .drop("__rn", opCol, seqCol))
  }
}
