package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the mergeable-datasheet contract: merging batch summaries is
  * EXACTLY equivalent to summarizing the union (dup hashes across
  * batches collapse, shared langs don't double-count, histograms add,
  * percentile cuts agree), merge order doesn't matter, and the
  * incremental card never re-reads a summarized batch (plan pin).
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val b1 = Seq(
    ("en", "the quick brown fox"),
    ("en", "the quick brown fox"), // in-batch dup
    ("de", "der schnelle fuchs springt hoch"),
    ("en", ""))
  private val b2 = Seq(
    ("en", "the quick brown fox"), // cross-batch dup
    ("fr", "le renard rapide"),
    ("de", "ganz anders hier"),
    ("fr", "un deux trois quatre cinq six sept"))
  private val b3 = Seq(("pt", "texto novo"), ("en", ""))

  private def df(rows: Seq[(String, String)]) = rows.toDF("lang", "text")

  private def cardRow(c: org.apache.spark.sql.DataFrame): Seq[Any] =
    c.collect().map(_.toSeq).toSeq.head

  test("merge of batch summaries equals the summary of the union") {
    val merged = CorpusStats.card(CorpusStats.merge(
      CorpusStats.summarize(df(b1)), CorpusStats.summarize(df(b2))))
    val direct = CorpusStats.card(CorpusStats.summarize(df(b1 ++ b2)))
    assert(cardRow(merged) == cardRow(direct))
    // spot-check the exact-distinct components against hand counts
    val row = merged.collect().head
    assert(row.getAs[Long]("n_docs") == 8)
    assert(row.getAs[Long]("n_empty") == 1)
    assert(row.getAs[Long]("n_langs") == 3)
    assert(row.getAs[Long]("n_unique_texts") == 6,
      "in-batch and cross-batch dup texts must collapse exactly")
  }

  test("null lang / null text never enter the set tables (oracle COUNT(DISTINCT) semantics)") {
    // round-15 ADVICE: a null lang (or md5(null)=null text) kept as a
    // set member shifts n_langs/n_unique_texts by one vs the DuckDB
    // twin's NULL-excluding COUNT(DISTINCT).
    val withNulls = Seq(
      (null.asInstanceOf[String], "the quick brown fox"),
      ("en", null.asInstanceOf[String]),
      ("en", "the quick brown fox"),
      ("fr", "le renard rapide"))
    val row = CorpusStats.card(CorpusStats.summarize(df(withNulls)))
      .collect().head
    assert(row.getAs[Long]("n_docs") == 4)
    assert(row.getAs[Long]("n_langs") == 2, "null lang must not count")
    assert(row.getAs[Long]("n_unique_texts") == 2, "null text must not count")
    // and merge keeps the exclusion (no null resurrect via union)
    val m = CorpusStats.card(CorpusStats.merge(
      CorpusStats.summarize(df(withNulls.take(2))),
      CorpusStats.summarize(df(withNulls.drop(2))))).collect().head
    assert(m.getAs[Long]("n_langs") == 2 && m.getAs[Long]("n_unique_texts") == 2)
  }

  test("merge is order-insensitive and associative") {
    val s = Seq(b1, b2, b3).map(b => CorpusStats.summarize(df(b)))
    val abc = CorpusStats.card(CorpusStats.merge(CorpusStats.merge(s(0), s(1)), s(2)))
    val cba = CorpusStats.card(CorpusStats.merge(s(2), CorpusStats.merge(s(1), s(0))))
    val direct = CorpusStats.card(CorpusStats.summarize(df(b1 ++ b2 ++ b3)))
    assert(cardRow(abc) == cardRow(cba) && cardRow(abc) == cardRow(direct))
  }

  test("the incremental card never re-reads the summarized base corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("corpstats-").toString
    df(b1 ++ b2).write.parquet(s"$tmp/base_corpus")
    val base = CorpusStats.summarize(spark.read.parquet(s"$tmp/base_corpus"))
    base.scalars.write.parquet(s"$tmp/scalars")
    base.hist.write.parquet(s"$tmp/hist")
    base.langs.write.parquet(s"$tmp/langs")
    base.hashes.write.parquet(s"$tmp/hashes")
    val persisted = CorpusStatsState(
      spark.read.parquet(s"$tmp/scalars"), spark.read.parquet(s"$tmp/hist"),
      spark.read.parquet(s"$tmp/langs"), spark.read.parquet(s"$tmp/hashes"))
    val card = CorpusStats.card(
      CorpusStats.merge(persisted, CorpusStats.summarize(df(b3))))
    val plan = card.queryExecution.executedPlan.toString
    assert(!plan.contains("base_corpus"),
      s"incremental card re-reads the base corpus:\n$plan")
    assert(cardRow(card) ==
      cardRow(CorpusStats.card(CorpusStats.summarize(df(b1 ++ b2 ++ b3)))))
  }
}
