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

  /** Snapshot DIFF — `applyChanges` inverted: given two keyed
    * snapshots, recover the change feed that turns `old` into `new`:
    * one row per differing key with `op` = "I" (key only in new),
    * "D" (key only in old), or "U" (key in both, any non-key column
    * differs), carrying the NEW row's values for I/U and the old
    * row's for D. The anti-entropy primitive: replica reconciliation,
    * backfill audits, and CDC-feed validation (diff(old, apply(old,
    * changes)) must reproduce the compacted changes — CdcSpec pins
    * the round-trip).
    *
    * Scale shape: ONE full-outer key-equi join — both snapshots
    * shuffle once on the key (co-partitioned/bucketed snapshots join
    * exchange-free, q42's layout) — and the value comparison is a
    * codegen'd struct equality per row; identical keys emit nothing,
    * so the output is change-sized, not table-sized.
    */
  def diff(old: DataFrame, newSnap: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(old.columns.sorted.sameElements(newSnap.columns.sorted),
      s"schema mismatch: ${old.columns.mkString(",")} vs ${newSnap.columns.mkString(",")}")
    // a misspelled key would otherwise land in valueCols and surface
    // later as an opaque unresolved-column Catalyst error from the join
    val missing = keys.filterNot(old.columns.contains)
    require(missing.isEmpty,
      s"key column(s) not in the snapshots: ${missing.mkString(",")} " +
        s"(have: ${old.columns.sorted.mkString(",")})")
    // reserved output/scratch names (the AsOfJoin guard discipline —
    // round-18 review): a snapshot "op" VALUE column would emit two
    // columns both named op; an "op" KEY would be silently overwritten
    // with the I/D/U marker; __ov/__nv/__v would collide with scratch
    val reserved = Seq("op", "__ov", "__nv", "__v").filter(old.columns.contains)
    require(reserved.isEmpty,
      s"diff reserves column name(s) ${reserved.mkString(",")} for its " +
        "change markers/scratch — rename them in the snapshots first")
    val valueCols = old.columns.filterNot(keys.contains).toSeq
    // keys-only snapshots are legal (membership diff): the comparison
    // payload degenerates to a constant, so "U" can never fire and the
    // output is pure I/D — struct() of zero columns would compare
    // vacuously equal too, but a literal keeps the plan trivial
    def payload = if (valueCols.isEmpty) lit(0) else struct(valueCols.map(col): _*)
    val o = old.select(keys.map(col) :+ payload.as("__ov"): _*)
    val n = newSnap.select(keys.map(col) :+ payload.as("__nv"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("__ov").isNull, "I")
          .when(col("__nv").isNull, "D")
          // null-safe: a null field inside the value struct compares
          // equal to null, different from any value
          .when(!(col("__ov") <=> col("__nv")), "U"))
      .filter(col("op").isNotNull)
      .withColumn("__v", coalesce(col("__nv"), col("__ov")))
      .select(keys.map(col) ++ Seq(col("op")) ++
        valueCols.map(c => col(s"__v.$c").as(c)): _*)
  }
}
