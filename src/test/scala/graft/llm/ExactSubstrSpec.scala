package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ExactSubstr against a brute-force reference (enumerate every
  * L-token window, count distinct docs per exact token sequence, merge
  * duplicated runs) on planted fixtures: cross-doc shared spans of
  * several shapes, adjacent islands merging into one maximal span,
  * SAME-document repeats excluded by contract, sub-L docs, and the
  * applyCuts round trip.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def toks(t: String): Vector[String] =
    t.trim.split("\\s+").filter(_.nonEmpty).toVector

  /** brute-force cut list: (doc_id, start_word 1-based, span_len) */
  private def ref(corpus: Seq[(Long, String)], L: Int): Set[(Long, Long, Long)] = {
    val tk = corpus.map { case (id, t) => id -> toks(t) }
    val occ = scala.collection.mutable.Map.empty[Vector[String], Set[Long]]
    for ((id, ts) <- tk; i <- 0 to ts.length - L)
      occ.updateWith(ts.slice(i, i + L).toVector)(o => Some(o.getOrElse(Set.empty) + id))
    tk.flatMap { case (id, ts) =>
      val dup = (0 to ts.length - L).filter(i => occ(ts.slice(i, i + L).toVector).size >= 2)
      // merge starts whose coverages overlap or touch (gap <= L)
      dup.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, i) if i <= e + L => (s, i) :: rest
        case (acc, i) => (i, i) :: acc
      }.map { case (s, e) => (id, (s + 1).toLong, (e - s + L).toLong) }
    }.toSet
  }

  private val L = 4
  private val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens
  private val corpus = Seq(
    1L -> s"one two three $shared four five",
    2L -> s"$shared completely different middle words here",
    3L -> "one two three unrelated tail of doc three runs long",
    // same-doc repeat only: must NOT be cut (cross-doc contract)
    4L -> "p4a q4b r4c s4d p4a q4b r4c s4d p4a q4b r4c s4d",
    5L -> "tiny doc", // shorter than L
    // two disjoint shared spans in one doc -> two islands
    6L -> s"$shared gap1 gap2 gap3 one two three unrelated tail of",
    7L -> "unrelated tail of doc zzz")

  test("cutList equals the brute-force reference on the planted corpus") {
    val got = ExactSubstr.cutList(corpus.toDF("doc_id", "text").repartition(5), L)
      .as[(Long, Long, Long)].collect().toSet
    val want = ref(corpus, L)
    assert(got == want, s"got ${got.toSeq.sorted}\nwant ${want.toSeq.sorted}")
    assert(want.nonEmpty, "planted fixture must be non-vacuous")
    // the contract checks, independent of the reference:
    assert(!got.exists(_._1 == 4L), "same-document repeat must not be cut")
    assert(!got.exists(_._1 == 5L), "sub-L docs have no windows")
    assert(got.count(_._1 == 6L) == 2, "disjoint spans stay separate islands")
    // doc 1's island covers the full 6-token shared run: span_len = 6
    assert(got.contains((1L, 4L, 6L)), s"maximal merged span wrong: $got")
  }

  test("adjacent islands from DIFFERENT partners merge into one maximal span") {
    // doc 10 holds A++B; doc 11 shares only A, doc 12 shares only B —
    // the duplicated windows of A and B are adjacent in doc 10 and must
    // merge into ONE span there even though no single partner holds it
    val a = "a1 a2 a3 a4"; val b = "b1 b2 b3 b4"
    val c2 = Seq(10L -> s"x $a $b y", 11L -> s"left $a right", 12L -> s"up $b down")
    val got = ExactSubstr.cutList(c2.toDF("doc_id", "text"), L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == ref(c2, L), "reference mismatch")
    assert(got.contains((10L, 2L, 8L)), s"A+B must merge in doc 10: $got")
  }

  test("applyCuts removes exactly the cut spans and nothing else") {
    val df = corpus.toDF("doc_id", "text")
    val cleaned = ExactSubstr.applyCuts(df, ExactSubstr.cutList(df, L))
      .as[(Long, String)].collect().toMap
    val cuts = ref(corpus, L).groupBy(_._1)
    for ((id, t) <- corpus) {
      val ts = toks(t)
      val cut = cuts.getOrElse(id, Set.empty)
      val keep = ts.zipWithIndex.collect { case (tok, i)
        if !cut.exists(c => i + 1 >= c._2 && i + 1 < c._2 + c._3) => tok }
      assert(cleaned(id) == keep.mkString(" "), s"doc $id")
    }
  }

  test("deterministic under partitioning") {
    val df7 = corpus.toDF("doc_id", "text").repartition(7)
    val df1 = corpus.toDF("doc_id", "text").coalesce(1)
    assert(ExactSubstr.cutList(df7, L).collect().map(_.toSeq).toSet ==
      ExactSubstr.cutList(df1, L).collect().map(_.toSeq).toSet)
  }

  test("incremental cut list == full recompute restricted to the batch; base never re-read") {
    val tmp = java.nio.file.Files.createTempDirectory("exsub-inc-").toString
    corpus.toDF("doc_id", "text").write.parquet(s"$tmp/base_corpus")
    val base = spark.read.parquet(s"$tmp/base_corpus")
    ExactSubstr.gramTable(base, L).select("gram").distinct()
      .write.parquet(s"$tmp/gram_index")
    val idx = spark.read.parquet(s"$tmp/gram_index")
    val batch = Seq(
      100L -> s"fresh head $shared fresh tail",       // corpus-index hit
      101L -> "batch only bq1 bq2 bq3 bq4 batch tail", // shared with 102 only
      102L -> "other intro bq1 bq2 bq3 bq4 differing end",
      103L -> "entirely novel content nothing shared here at all")
    val got = ExactSubstr.cutListIncremental(batch.toDF("doc_id", "text"), idx, L)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("base_corpus"),
      s"incremental span dedup re-reads the base corpus:\n$plan")
    val want = ref(corpus ++ batch, L).filter(_._1 >= 100L)
    assert(got.as[(Long, Long, Long)].collect().toSet == want)
    assert(want.exists(_._1 == 100L) && want.exists(_._1 == 101L) &&
      want.exists(_._1 == 102L) && !want.exists(_._1 == 103L),
      s"fixture must exercise index-hit, batch-pair and clean paths: $want")
    // index maintenance: merging the batch reproduces the full rebuild,
    // and re-merging the same batch is a no-op (set-union idempotence)
    val bdf = batch.toDF("doc_id", "text")
    val merged = ExactSubstr.mergeGramIndex(idx, bdf, L)
    val rebuilt = ExactSubstr
      .gramTable((corpus ++ batch).toDF("doc_id", "text"), L)
      .select("gram").distinct()
    assert(merged.as[String].collect().toSet ==
      rebuilt.as[String].collect().toSet, "merge != full rebuild")
    assert(ExactSubstr.mergeGramIndex(merged, bdf, L).count() == merged.count(),
      "re-merging the same batch must be a no-op")
  }

  test("decontaminateCuts cuts a planted bench quote while the host document survives") {
    val quote = "qa qb qc qd qe qf" // 6 tokens > L
    val bench = Seq(
      900L -> s"eval item intro $quote eval item outro",
      901L -> "another eval item with nothing quoted anywhere")
    val train = Seq(
      1L -> s"host head one two three $quote host tail four five",
      2L -> "a completely clean training document with no quotes at all",
      // train-internal repeats are NOT cuts when bench lacks the gram
      // (qa qb zz qd is no bench window) — decon probes bench only
      3L -> "qa qb zz qd repeated qa qb zz qd but never six long")
    val cuts = ExactSubstr.decontaminateCuts(
      train.toDF("doc_id", "text"), bench.toDF("doc_id", "text"), L)
      .as[(Long, Long, Long)].collect().toSet
    // doc 1: quote tokens are positions 6..11 -> windows 6,7,8 -> one
    // island (start 6, span 6). docs 2/3: no bench gram -> no cuts.
    assert(cuts == Set((1L, 6L, 6L)), s"got $cuts")
    // and the host survives: applying the cuts keeps everything else
    val cleaned = ExactSubstr.applyCuts(train.toDF("doc_id", "text"),
        ExactSubstr.decontaminateCuts(train.toDF("doc_id", "text"),
          bench.toDF("doc_id", "text"), L))
      .as[(Long, String)].collect().toMap
    assert(cleaned(1L) == "host head one two three host tail four five")
    assert(cleaned(2L) == train.toMap.apply(2L))
  }

  test("the composed ingest clean (cutListIncremental + applyCuts) never re-reads the base corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("exsub-clean-").toString
    corpus.toDF("doc_id", "text").write.parquet(s"$tmp/base_corpus")
    val base = spark.read.parquet(s"$tmp/base_corpus")
    ExactSubstr.gramTable(base, L).select("gram").distinct()
      .write.parquet(s"$tmp/gram_index")
    val idx = spark.read.parquet(s"$tmp/gram_index")
    val batch = Seq(
      100L -> s"fresh head $shared fresh tail",
      103L -> "entirely novel content nothing shared here at all")
    val bdf = batch.toDF("doc_id", "text")
    val cleaned = ExactSubstr.applyCuts(bdf,
      ExactSubstr.cutListIncremental(bdf, idx, L))
    val plan = cleaned.queryExecution.executedPlan.toString
    assert(!plan.contains("base_corpus"),
      s"composed ingest clean re-reads the base corpus:\n$plan")
    val got = cleaned.as[(Long, String)].collect().toMap
    val cut = ref(corpus ++ batch, L).filter(_._1 >= 100L).groupBy(_._1)
    for ((id, t) <- batch) {
      val ts = toks(t)
      val keep = ts.zipWithIndex.collect { case (tok, i)
        if !cut.getOrElse(id, Set.empty)
          .exists(c => i + 1 >= c._2 && i + 1 < c._2 + c._3) => tok }
      assert(got(id) == keep.mkString(" "), s"doc $id")
    }
    assert(got(100L) != batch.toMap.apply(100L), "index hit must cut")
    assert(got(103L) == batch.toMap.apply(103L), "novel doc passes through")
  }

  test("applyCuts is linear: a many-cut long document matches the per-token reference") {
    // doc 200: 120 tokens where every odd 8-token block is shared with
    // a partner doc — ~15 disjoint cut islands in one document (the
    // round-15 verdict item-3 fixture: many cuts, interleaved keeps)
    val blocks = (0 until 15).map { b =>
      val shared = (0 until 4).map(j => s"sh${b}x$j").mkString(" ")
      val unique = (0 until 4).map(j => s"u200b${b}j$j").mkString(" ")
      (shared, unique)
    }
    val host = 200L -> blocks.map { case (s, u) => s"$s $u" }.mkString(" ")
    val partners = blocks.zipWithIndex.map { case ((s, _), b) =>
      (300L + b) -> s"partner intro $s partner outro token$b"
    }
    val c3 = host +: partners
    val df = c3.toDF("doc_id", "text")
    val cutsDf = ExactSubstr.cutList(df, L)
    val got = ExactSubstr.applyCuts(df, cutsDf)
      .as[(Long, String)].collect().toMap
    val cuts = ref(c3, L).groupBy(_._1)
    assert(cuts.getOrElse(200L, Set.empty).size >= 10,
      s"fixture must plant many islands in the host doc: ${cuts.get(200L)}")
    for ((id, t) <- c3) {
      val ts = toks(t)
      val cut = cuts.getOrElse(id, Set.empty)
      val keep = ts.zipWithIndex.collect { case (tok, i)
        if !cut.exists(c => i + 1 >= c._2 && i + 1 < c._2 + c._3) => tok }
      assert(got(id) == keep.mkString(" "), s"doc $id")
    }
  }

  test("gramTable streams a multi-hundred-kilotoken document (no one-row gram array)") {
    // One ~300k-token document (~2 MB text): the pre-round-16 shape
    // materialized its full ~48 B × n_tokens md5 array in ONE row; the
    // streamed shape only ever holds the token array per row. Pin the
    // output contract at size: exact window count, correct first/last
    // starts, and a spot-checked fingerprint equal to a directly
    // computed md5.
    val n = 300000
    val big = (0 until n).map(i => s"t${i % 97}w${i / 97}").mkString(" ")
    val df = Seq(1L -> big).toDF("doc_id", "text")
    val g = ExactSubstr.gramTable(df, 8).cache()
    try {
      assert(g.count() == n - 7L)
      val mm = g.agg(min($"start"), max($"start")).as[(Long, Long)].head()
      assert(mm == ((1L, n - 7L)))
      val first = g.filter($"start" === 1L).select($"gram").as[String].head()
      val wantFirst = java.security.MessageDigest.getInstance("MD5")
        .digest((0 until 8).map(i => s"t${i % 97}w${i / 97}")
          .mkString("\u0001").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(first == wantFirst, "fingerprint formula drifted")
    } finally g.unpersist()
  }
}
