package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-6 corpus ops: boilerplate-line removal, deterministic
  * stratified subsampling, sequence packing. (Their oracle twins are
  * q44-q46; these specs pin hand-computed semantics on fixtures the
  * oracle can't shape.)
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("stripBoilerplate: shared footer removed, unique bodies kept") {
    val docs = Seq(
      (1L, "alpha body\nall rights reserved"),
      (2L, "beta body\nall rights reserved"),
      (3L, "gamma body\nall rights reserved"),
      (4L, "delta body\nall rights reserved")
    ).toDF("doc_id", "text")
    val out = TextOps.stripBoilerplate(docs, "doc_id", "text", maxDfFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 2L, 1L)))
  }

  test("stripBoilerplate: nothing above the bar removes nothing") {
    val docs = Seq((1L, "a\nb"), (2L, "c\nd")).toDF("doc_id", "text")
    val out = TextOps.stripBoilerplate(docs, "doc_id", "text", maxDfFraction = 0.6)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.forall { case (n, kept) => n === 2L && kept === 2L })
  }

  test("stratifiedSample: deterministic, stratum-bounded, missing strata dropped") {
    val docs = (0 until 200).map(i => (i.toLong, s"document body $i",
      if (i % 2 == 0) "en" else "xx")).toDF("doc_id", "text", "lang")
    val kept = TextOps.stratifiedSample(docs, "text", "lang", Map("en" -> "40"))
    val rows = kept.select("doc_id", "lang").as[(Long, String)].collect()
    assert(rows.forall(_._2 == "en"), "strata absent from the bounds map must drop")
    // ~25% of the 100 en docs; exact set is a pure function of md5
    assert(rows.length > 5 && rows.length < 60)
    val again = TextOps.stratifiedSample(docs, "text", "lang", Map("en" -> "40"))
      .select("doc_id").as[Long].collect().toSet
    assert(again === rows.map(_._1).toSet, "the md5 coin must be deterministic")
    intercept[IllegalArgumentException] {
      TextOps.stratifiedSample(docs, "text", "lang", Map("en" -> "4G"))
    }
  }

  test("packSequences: hand-computed windows, straddles and empty docs") {
    // token counts 3, 2, 0, 5 at window 4:
    // offsets 0, 3, 5, 5 -> starts 0, 0, 1, 1; spans 1, 2 (straddle), 1, 2
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "   "), (4L, "f g h i j")
    ).toDF("doc_id", "text")
    val out = TextOps.packSequences(docs, "doc_id", "text", windowTokens = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 3L, 0L, 1L), (2L, 2L, 0L, 2L), (3L, 0L, 1L, 1L), (4L, 5L, 1L, 2L)))
  }

  test("packSequences: shard-count invariant — cross-shard straddles agree with one shard") {
    // token counts 0..10 cycling over 500 docs at window 16: windows
    // straddle shard boundaries wherever they fall, so any base-offset
    // error shows up as a start/span mismatch vs the single-shard run
    val docs = (0 until 500)
      .map(i => (i.toLong, ("tok " * (i % 11)).trim))
      .toDF("doc_id", "text")
    def packed(shards: Int) =
      TextOps.packSequences(docs, "doc_id", "text", windowTokens = 16,
          numShards = shards)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val one = packed(1)
    assert(packed(7) === one)
    assert(packed(32) === one, "more shards than useful must still agree")
  }

  test("packSequences: no single-partition stage in the plan (100 TB contract)") {
    val docs = (0 until 200).map(i => (i.toLong, s"a b c d")).toDF("doc_id", "text")
    val out = TextOps.packSequences(docs, "doc_id", "text", windowTokens = 4,
      numShards = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"packSequences must never funnel the corpus through one task:\n$plan")
    // the running sum is a per-shard window, never a global one
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.forall(_.contains("__part")),
      s"every window must be keyed by the shard column:\n${windowLines.mkString("\n")}")
  }
}
