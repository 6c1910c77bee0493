package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cdc.merge / applyChanges: hand-traced snapshot transitions — update
  * replaces wholesale, insert lands, delete removes, latest seq wins
  * within a batch, untouched rows survive byte-identical.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "s", "v")

  test("merge: upsert replaces matched keys and inserts new ones") {
    val updates = Seq((2L, "B", 22.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    val got = Cdc.merge(base, updates, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "a", 10.0), (2L, "B", 22.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("applyChanges: latest seq wins, deletes remove, inserts land") {
    val changes = Seq(
      (2L, "B1", 21.0, "U", 1L), // superseded by seq 2
      (2L, "B2", 22.0, "U", 2L), // wins
      (3L, "c", 30.0, "D", 1L),  // delete key 3
      (4L, "d", 40.0, "I", 1L),  // insert
      (5L, "e", 50.0, "I", 1L),  // inserted then deleted in-batch ->
      (5L, "e", 50.0, "D", 2L)   // never appears
    ).toDF("k", "s", "v", "op", "seq")
    val got = Cdc.applyChanges(base, changes, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "a", 10.0), (2L, "B2", 22.0), (4L, "d", 40.0)))
  }

  test("applyChanges output schema equals the base schema") {
    val changes = Seq((9L, "z", 9.0, "I", 1L)).toDF("k", "s", "v", "op", "seq")
    assert(Cdc.applyChanges(base, changes, Seq("k")).columns.toSeq ===
      base.columns.toSeq)
  }
}
