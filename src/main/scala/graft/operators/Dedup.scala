package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators.
  *
  * Reference parity: merge.py:38-39 / concat_embeddings.py:21-22 do
  * `pd.concat(...)` then `~index.duplicated(keep='first')` — an
  * order-sensitive keyed dedup where earlier sources win. Spark unions
  * don't preserve order, so priority is made explicit (SURVEY.md §7.4-4).
  *
  * Scale: keepFirst is one shuffle on the key (window partitionBy);
  * with AQE skew handling this survives hot keys. exactDedup is a
  * hash-groupBy (map-side partial min). Nothing collects to the driver.
  */
object Dedup {

  /** Keep exactly one row per key, the first under `order`. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Union sources with provenance priority (earlier DataFrame wins),
    * then keep-first per key — the merge.py semantics. Ties within a
    * source break by `order`.
    */
  def unionKeepFirst(sources: Seq[DataFrame], keys: Seq[String],
                     order: Seq[Column]): DataFrame = {
    val tagged = sources.zipWithIndex.map { case (df, i) =>
      df.withColumn("__src_priority", lit(i))
    }
    val unioned = tagged.reduce(_ unionByName _)
    keepFirst(unioned, keys, Seq(col("__src_priority").asc) ++ order)
      .drop("__src_priority")
  }

  /** Exact duplicate groups by content hash; keeps the row with the
    * minimum `idCol` per group and reports the group size.
    * At 100 TB: hash-groupBy shuffles only (hash, id) after map-side
    * partial aggregation — the text itself never shuffles twice.
    */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
}
