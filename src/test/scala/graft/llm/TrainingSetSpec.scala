package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The one-call assembly must satisfy every stage's postcondition on
  * the REAL corpus, and be bit-identical under different input
  * partitionings (the rerun-stability contract).
  */
class TrainingSetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"))
  // heldout = a deterministic slice of the corpus itself → guaranteed
  // contamination pressure on exactly those docs
  private lazy val heldout = docs.filter(col("doc_id") % 17 === 0)
    .select(col("doc_id"), col("text"))

  private def assemble(parts: Int) = TrainingSet.build(
    docs.repartition(parts), heldout.repartition(3),
    "doc_id", "text", "lang", minQuality = 0.3,
    budgets = Map("en" -> 3000L), defaultBudget = 1200L)

  private lazy val out = assemble(7).cache()

  test("deterministic under partitioning; survivors are clean, fresh, and gated") {
    val a = out.collect().map(_.toSeq).toSet
    val b = assemble(2).collect().map(_.toSeq).toSet
    assert(a === b, "assembly must not depend on input partitioning")
    assert(out.count() > 0)
    val ids = out.select("doc_id")
    val kept = docs.join(ids, Seq("doc_id"), "left_semi")
    // decontaminated: zero 13-gram overlap with the heldout set
    val overlap = CorpusDedup.decontaminate(kept, heldout,
      "doc_id", "text").count()
    assert(overlap === 0L, "a contaminated doc survived")
    // gated: every survivor clears the quality floor
    assert(kept.filter(TextOps.qualityScore(col("text")) < 0.3).count() === 0L)
    // cleaned: no two survivors share exact content
    assert(kept.groupBy(md5(col("text"))).count().filter(col("count") > 1)
      .count() === 0L, "exact duplicates survived the clean")
  }

  test("split proportions per language follow the integer rank cuts") {
    val byLang = out.groupBy(col("lang"), col("split")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = out.select("lang").distinct().as[String].collect()
    langs.foreach { l =>
      val n = Seq("train", "val", "test").map(s => byLang.getOrElse((l, s), 0L)).sum
      val train = byLang.getOrElse((l, "train"), 0L)
      // rank-cut arithmetic: train = floor(0.8n), val = floor(0.9n)-floor(0.8n)
      assert(train === n * 8 / 10, s"lang $l train cut")
      assert(byLang.getOrElse((l, "val"), 0L) === n * 9 / 10 - n * 8 / 10,
        s"lang $l val cut")
    }
  }

  test("train token budgets bind with straddle semantics; val/test always admitted") {
    assert(out.filter(col("split") =!= "train" && !col("admitted"))
      .count() === 0L)
    val perLang = out.filter(col("split") === "train")
      .groupBy(col("lang"))
      .agg(sum(when(col("admitted"), col("n_tokens"))).cast("long").as("adm"),
        max(when(col("admitted"), col("n_tokens"))).cast("long").as("mx"),
        sum(col("n_tokens")).cast("long").as("all"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    perLang.foreach { case (l, adm, mx, all) =>
      val budget = if (l == "en") 3000L else 1200L
      // admitted ≤ budget + the straddling doc; if under budget with
      // slack, everything must have been admitted
      assert(adm < budget + mx, s"lang $l over budget beyond the straddle")
      if (all < budget) assert(adm === all, s"lang $l under-admitted")
    }
    // at least one language must actually hit its budget for the test
    // to mean anything
    assert(perLang.exists { case (_, adm, _, all) => adm < all },
      "no language's budget bound — fixture too small for the assertion")
  }

  test("release stage: k-anonymous export, starred tail, admitted-set partition") {
    val k = 4L
    val rel = TrainingSet.build(
      docs.repartition(5), heldout.repartition(3),
      "doc_id", "text", "lang", minQuality = 0.3,
      budgets = Map("en" -> 3000L), defaultBudget = 1200L,
      release = Some(TrainingSet.Release(
        Seq("lang", "split"), "n_tokens", widths = Seq(10L, 50L, 200L),
        k = k, starLadder = Seq("lang")))).cache()
    val admitted = out.filter(col("admitted"))
    // released ⊆ admitted (ids), each id at most once
    val relIds = rel.select("doc_id").collect().map(_.getLong(0))
    assert(relIds.length == relIds.distinct.length)
    val admIds = admitted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(relIds.forall(admIds), "released a non-admitted doc")
    // every released cell satisfies >= k under its OWN generalization
    val cells = rel.groupBy(col("lang"), col("split"),
        col("bucket_lo"), col("bucket_width"))
      .agg(count(lit(1)).as("n")).collect()
    cells.foreach(r => assert(r.getLong(4) >= k,
      s"cell ${r.toSeq} released under k"))
    rel.unpersist()
  }

  test("rank stages run over the skinny metadata projection, never text") {
    // r18 optimization pin: stages 4-5 read a checkpointed
    // (id, lang, hash, token-count) projection, so the executed plan
    // of the assembled frame must not reference the text column — the
    // stage-1..3 subtree (which does read text) sits below the
    // checkpoint and out of the rank shuffles. A `text#` attribute
    // reappearing here means document payloads are riding the range
    // exchanges again.
    val plan = assemble(3).queryExecution.executedPlan.toString
    assert(!plan.contains("text#"),
      "assembled plan references the text column above the metadata checkpoint")
  }
}
