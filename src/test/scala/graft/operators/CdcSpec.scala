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

  test("diff: classifies I/U/D, identical keys silent, null-safe values") {
    val old = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None, 30.0), (4L, Some("d"), 40.0)).toDF("k", "s", "v")
    val neu = Seq((1L, Some("a"), 10.0),           // unchanged -> silent
      (2L, Some("B"), 20.0),                       // value change -> U
      (3L, None, 30.0),                            // null field unchanged -> silent
      (5L, Some("e"), 50.0)).toDF("k", "s", "v")   // 4 gone -> D; 5 new -> I
    val got = Cdc.diff(old, neu, Seq("k"))
      .select("k", "op", "s", "v")
      .as[(Long, String, Option[String], Double)].collect().toSet
    assert(got === Set(
      (2L, "U", Some("B"), 20.0),   // U carries the NEW row
      (4L, "D", Some("d"), 40.0),   // D carries the old row
      (5L, "I", Some("e"), 50.0)))
  }

  test("diff round-trip: diff(base, applyChanges(base, c)) reproduces the compacted feed") {
    val changes = Seq(
      (2L, "B2", 22.0, "U", 2L),
      (3L, "c", 30.0, "D", 1L),
      (4L, "d", 40.0, "I", 1L)
    ).toDF("k", "s", "v", "op", "seq")
    val next = Cdc.applyChanges(base, changes, Seq("k"))
    val got = Cdc.diff(base, next, Seq("k"))
      .select("k", "op", "s", "v")
      .as[(Long, String, String, Double)].collect().toSet
    assert(got === Set((2L, "U", "B2", 22.0), (3L, "D", "c", 30.0),
      (4L, "I", "d", 40.0)))
  }

  test("diff rejects mismatched schemas") {
    intercept[IllegalArgumentException] {
      Cdc.diff(base, base.drop("v"), Seq("k"))
    }
  }

  test("diff rejects a misspelled key up front, not as an opaque join error") {
    val e = intercept[IllegalArgumentException] {
      Cdc.diff(base, base, Seq("key_typo"))
    }
    assert(e.getMessage.contains("key_typo"))
  }

  test("diff on keys-only snapshots: membership diff, pure I/D") {
    val oldK = Seq(1L, 2L, 3L).toDF("k")
    val newK = Seq(2L, 3L, 4L).toDF("k")
    val got = Cdc.diff(oldK, newK, Seq("k"))
      .select("k", "op").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "D"), (4L, "I")))
  }
}
