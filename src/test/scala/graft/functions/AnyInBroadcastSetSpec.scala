package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The broadcast membership probe must equal the isInCollection
  * composition it replaces (releaseGate's span probe), survive both
  * execution paths, and honor the null contract.
  */
class AnyInBroadcastSetSpec extends SparkSpec {
  import spark.implicits._

  private val set = Set("bb", "dd", "的")

  test("equals the exists+isInCollection composition on real token arrays") {
    val bc = spark.sparkContext.broadcast(set)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"),
        graft.llm.TextOps.tokens(concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0, lit(" dd"))
            .otherwise(lit("")))).as("t"))
      .localCheckpoint()
    val native = docs.select(col("doc_id"),
        AnyInBroadcastSet(col("t"), bc).as("f"))
      .as[(Long, Boolean)].collect().toMap
    val builtin = docs.select(col("doc_id"),
        exists(col("t"), x => x.isInCollection(set)).as("f"))
      .as[(Long, Boolean)].collect().toMap
    assert(native === builtin)
    assert(native.valuesIterator.exists(identity) &&
      native.valuesIterator.exists(!_))
    docs.unpersist(blocking = false)
  }

  test("interpreted path matches codegen; null/edge contract") {
    val bc = spark.sparkContext.broadcast(set)
    val rows = Seq(
      (1L, Seq("aa", "bb")),          // hit
      (2L, Seq("aa", "cc")),          // miss
      (3L, Seq("的")),                // multi-byte hit
      (4L, Seq.empty[String]),        // empty → false
      (5L, null)).toDF("id", "t")     // null → null
    def run(): Map[Long, Option[Boolean]] = rows
      .select(col("id"), AnyInBroadcastSet(col("t"), bc).as("f"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try run()
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(codegen === interpreted)
    assert(codegen === Map(1L -> Some(true), 2L -> Some(false),
      3L -> Some(true), 4L -> Some(false), 5L -> None))
    // a null ELEMENT never matches but doesn't poison the row
    val withNull = Seq(1L).toDF("id")
      .select(AnyInBroadcastSet(
        array(lit(null).cast("string"), lit("bb")), bc).as("f"))
      .as[Boolean].head()
    assert(withNull)
  }
}
