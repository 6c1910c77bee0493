package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

object DocStreamSpec {
  // top-level: Spark's product encoder cannot reach suite-inner classes
  final case class Doc(doc_id: Long, text: String, ts: Timestamp)
  final case class SDoc(doc_id: Long, text: String, source: String, ts: Timestamp)
  final case class Vec(vec_id: Long, embedding: Seq[Double], ts: Timestamp)
}

/** Streaming corpus intake: fingerprint dedup drops re-crawls within
  * the watermark (including normalized near-copies — the q24 key), and
  * the quality gate + PII scrub match their batch expressions.
  */
class DocStreamSpec extends SparkSpec {
  import DocStreamSpec.{Doc, SDoc}
  import spark.implicits._

  private def ts(minute: Int): Timestamp = new Timestamp(60000L * minute)

  private val body =
    "a reasonably long and ordinary document body with plenty of " +
      "normal words that clears the quality bar for this fixture test"

  test("intake: re-crawls dedup on the normalized fingerprint, low quality drops") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = DocStream.intake(source.toDF(), minQuality = 5.0).writeStream
      .format("memory").queryName("intake").outputMode("append").start()
    source.addData(
      Doc(1, body, ts(1)),
      Doc(2, body.toUpperCase + "  ", ts(5)),       // normalized duplicate of 1
      Doc(3, "spam!!!! $$$$ ????", ts(6)),          // fails the quality gate
      Doc(4, body + " but genuinely different tail content here", ts(7)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("intake").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 4L),
      "the normalized re-crawl and the junk doc must not pass intake")
    // scrubbed + scored columns present
    val cols = spark.table("intake").columns.toSet
    assert(Set("quality", "n_tokens").subsetOf(cols))
  }

  test("modelGate: stream scoring ≡ the batch q172 scorer, row for row") {
    implicit val sq = spark.sqlContext
    val docs = Seq(
      Doc(1, body, ts(1)),
      Doc(2, "zzz qqq vvv xxx", ts(2)),
      Doc(3, "", ts(3)),
      Doc(4, "the and of to is a " + body, ts(4)))
    val source = MemoryStream[Doc]
    val q = DocStream.modelGate(source.toDF()).writeStream
      .format("memory").queryName("modelgate").outputMode("append").start()
    source.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    // passthrough contract: the gate APPENDS scorer columns — input
    // columns (ts!) survive for downstream watermark/dedup stages
    assert(spark.table("modelgate").columns.toSet ===
      Set("doc_id", "text", "ts",
        "n_tokens", "margin_milli", "score", "keep"))
    val got = spark.table("modelgate")
      .select("doc_id", "n_tokens", "margin_milli", "score", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val expected = graft.llm.QualityModel
      .scoreDocs(docs.toDF().select(col("doc_id"), col("text")))
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("dsirGate: stream scoring ≡ the batch q173 scorer over the same model") {
    implicit val sq = spark.sqlContext
    val target = Seq((1L, "good clean prose with usual words"))
      .toDF("doc_id", "text")
    val rawDocs = Seq(
      Doc(1, "good clean prose with usual words", ts(1)),
      Doc(2, "zzz spam qqq", ts(2)),
      Doc(3, "", ts(3)))
    val raw = rawDocs.toDF().select(col("doc_id"), col("text"))
    val llr = graft.llm.Dsir.llrTable(target, raw)
    val model = graft.llm.Dsir.loadModel(llr)
    val source = MemoryStream[Doc]
    val q = DocStream.dsirGate(source.toDF(), model).writeStream
      .format("memory").queryName("dsirgate").outputMode("append").start()
    source.addData(rawDocs: _*)
    q.processAllAvailable()
    q.stop()
    // passthrough contract (round-18 review): scorer columns APPEND —
    // ts/text survive for downstream watermark/dedup stages
    assert(spark.table("dsirgate").columns.toSet ===
      Set("doc_id", "text", "ts", "n_tokens", "score"))
    val got = spark.table("dsirgate")
      .select("doc_id", "n_tokens", "score")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val expected = graft.llm.Dsir.scoreDocs(raw, llr)
      .select(col("doc_id"), col("n_tokens"), col("score"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("learnedGate: stream scoring ≡ the batch q191 scorer over the same weights") {
    // the 22nd stream-≡-batch twin: the learned weight table fits on
    // planted clean-vs-junk classes, broadcasts once, and the stream
    // scores bit-identically to the batch path — with every input
    // column passing through (the modelGate passthrough contract).
    implicit val sq = spark.sqlContext
    val clean = Seq((1L, "good clean prose with usual words"),
      (2L, "more ordinary clean words here")).toDF("doc_id", "text")
    val junk = Seq((1L, "zzgood zzclean zzprose zzwith zzusual zzwords"),
      (2L, "zzmore zzordinary zzclean zzwords zzhere")).toDF("doc_id", "text")
    val w = spark.sparkContext.broadcast(
      graft.llm.QualityModel.loadWeights(
        graft.llm.QualityModel.fitWeights(clean, junk)))
    val feed = Seq(
      Doc(1, "good clean prose with usual words", ts(1)), // keep
      Doc(2, "zzmore zzordinary zzclean junkish", ts(2)), // reject
      Doc(3, "", ts(3)))                                  // empty: keep
    val source = MemoryStream[Doc]
    val q = DocStream.learnedGate(source.toDF(), w).writeStream
      .format("memory").queryName("learnedgate").outputMode("append").start()
    source.addData(feed: _*)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("learnedgate").columns.toSet ===
      Set("doc_id", "text", "ts",
        "n_tokens", "margin_nano", "score", "keep"))
    val got = spark.table("learnedgate")
      .select("doc_id", "n_tokens", "margin_nano", "score", "keep")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val expected = graft.llm.QualityModel
      .scoreDocsLearned(feed.toDF().select(col("doc_id"), col("text")), w)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === expected)
    val keeps = got.map(r => r._1 -> r._5).toMap
    assert(keeps === Map(1L -> true, 2L -> false, 3L -> true),
      s"gate verdicts drifted: $got")
  }

  test("tokenBillingGate: stream billing ≡ the batch q190 scorer over the same merges") {
    // the 23rd stream-≡-batch twin: merges LEARNED from a planted
    // corpus (the q189 trainer), then the stream bills arriving docs
    // identically to the batch q190 projection — with every input
    // column passing through (the modelGate passthrough contract).
    implicit val sq = spark.sqlContext
    val trainCorpus = Seq("the the then than that", "than the theme")
      .toDF("text")
    val merges = graft.llm.BpeTrain.learnMerges(
      graft.llm.BpeTrain.wordCounts(trainCorpus), k = 6).map(m => (m.a, m.b))
    val feed = Seq(
      Doc(1, "the than theme", ts(1)),
      Doc(2, "entirely novel words", ts(2)),
      Doc(3, "", ts(3)))
    val source = MemoryStream[Doc]
    val q = DocStream.tokenBillingGate(source.toDF(), merges).writeStream
      .format("memory").queryName("tokenbilling").outputMode("append").start()
    source.addData(feed: _*)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("tokenbilling").columns.toSet ===
      Set("doc_id", "text", "ts", "n_learned_tokens", "n_ws_tokens"))
    val got = spark.table("tokenbilling")
      .select("doc_id", "n_learned_tokens", "n_ws_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val expected = feed.toDF().select(col("doc_id"),
        graft.llm.Bpe.tokenCountWith(merges, col("text"))
          .as("n_learned_tokens"),
        graft.llm.TextOps.tokenCount(col("text")).cast("long")
          .as("n_ws_tokens"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === expected)
    // the learned merges genuinely compress: doc 1 is 12 letters, so
    // per-char (untrained) billing would be 12 model tokens — the
    // trained table must land strictly below; the empty doc bills 0
    val billed = got.map(r => r._1 -> r._2).toMap
    assert(billed(1L) < 12L, s"billing looks untrained: $got")
    assert(billed(3L) === 0L)
  }

  test("dedup state is watermark-bounded: the same content far later passes again") {
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = DocStream.dedupDocs(source.toDF(), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    source.addData(Doc(1, body, ts(1)))
    q.processAllAvailable()
    // push the watermark far past doc 1's eviction horizon...
    source.addData(Doc(99, "watermark mover sentinel", ts(500)))
    q.processAllAvailable()
    // ...then the SAME content arrives again: its state is gone, it passes
    source.addData(Doc(2, body, ts(501)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L, 99L),
      "content re-arriving after state eviction must pass (bounded memory)")
  }

  test("nearDupFlags: planted near-dup flags against the static index; unrelated passes") {
    implicit val sq = spark.sqlContext
    import graft.llm.NearDup
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val bandsIdx = NearDup.bandIndex(corpus, "doc_id", "text")
    val shingles = NearDup.shingleSets(corpus, "doc_id", "text")
    val source = MemoryStream[Doc]
    val q = DocStream.nearDupFlags(source.toDF(), bandsIdx, shingles,
        threshold = 0.5).writeStream
      .format("memory").queryName("ndflags").outputMode("append").start()
    source.addData(
      // near-dup of corpus doc 10 (one token changed)
      Doc(101, "alpha beta gamma delta epsilon zeta eta theta iota REPLACED", ts(1)),
      // unrelated content — must not flag
      Doc(102, "completely different words about nothing shared at all here", ts(2)))
    q.processAllAvailable()
    // watermark mover so the (doc, window) aggregate closes and emits
    source.addData(Doc(999, "sentinel mover with enough tokens to shingle fine", ts(500)))
    q.processAllAvailable()
    q.stop()
    val flags = spark.table("ndflags")
      .select("doc_id", "dup_of", "n_matches")
      .as[(Long, Long, Long)].collect()
    assert(flags.map(_._1).toSet === Set(101L), s"unexpected flags: ${flags.toSeq}")
    assert(flags.head._2 === 10L && flags.head._3 === 1L)
  }

  test("nearDupFlags: stream over the real corpus equals the batch run of the same plan") {
    // Probe = truncated twins of every sf0.001 doc (q27's trailing-edit
    // relation), corpus index = the originals: every twin must flag its
    // base; flagged set and (dup_of, max_jaccard) must equal the SAME
    // joins run in batch, and every flagged base must appear in the
    // exact-Jaccard ground truth of (twin, base) pairs.
    implicit val sq = spark.sqlContext
    import graft.llm.NearDup
    val originals = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bandsIdx = NearDup.bandIndex(originals, "doc_id", "text").localCheckpoint()
    val shingles = NearDup.shingleSets(originals, "doc_id", "text").localCheckpoint()
    val twins = originals.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      substring(col("text"), lit(1),
        greatest(length(col("text")) - 10, lit(1))).as("text"),
      timestamp_millis(col("doc_id") * 1000 + 10000000L).as("ts"))
    val threshold = 0.6
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("doc_id"), col("dup_of"), round(col("max_jaccard"), 9), col("n_matches"))
      .as[(Long, Long, Double, Long)].collect().toSet
    // batch twin: identical plan, watermark is a no-op in batch mode
    val want = key(DocStream.nearDupFlags(twins, bandsIdx, shingles, threshold))
    val source = MemoryStream[Doc]
    val q = DocStream.nearDupFlags(source.toDF(), bandsIdx, shingles, threshold)
      .writeStream.format("memory").queryName("ndflags_corpus")
      .outputMode("append").start()
    source.addData(twins.as[Doc].collect().toIndexedSeq)
    q.processAllAvailable()
    source.addData(Doc(-1, "watermark mover sentinel with tokens", ts(100000)))
    q.processAllAvailable()
    q.stop()
    val got = key(spark.table("ndflags_corpus").filter(col("doc_id") >= 0))
    assert(got === want)
    assert(got.nonEmpty, "no twin flagged — index probe is broken")
    // flags are real near-dups: (twin, base) must sit in the exact set
    val exact = NearDup.exactJaccardPairs(
      originals.unionByName(twins.drop("ts")), "doc_id", "text", threshold)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    got.foreach { case (id, dupOf, _, _) =>
      assert(exact.contains((dupOf, id)) || exact.contains((id, dupOf)),
        s"flag ($id -> $dupOf) not in the exact ground truth")
    }
  }

  test("batch/stream agreement: the gate keeps exactly the batch-filter rows") {
    val docs = Seq(
      Doc(1, body, ts(1)),
      Doc(2, "x", ts(2)),
      Doc(3, body + " extra", ts(3))).toDF()
    val batchKept = DocStream.qualityGate(docs, minQuality = 2.0)
      .select("doc_id").as[Long].collect().sorted
    assert(batchKept.nonEmpty && !batchKept.contains(2L))
  }

  test("batch/stream agreement on a real corpus: kept ids AND redacted hashes identical") {
    // The intake claims to BE the batch pipeline run incrementally
    // (same expressions, DocStream scaladoc) — assert it on the real
    // documents table plus planted normalized re-crawls: same kept-id
    // set, same redacted text (by md5), same quality/token columns.
    import graft.llm.TextOps
    // event times offset well past epoch 0: a row AT the initial
    // watermark (0) is dropped as late by the stateful operator
    val originals = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"),
        timestamp_millis(col("doc_id") * 1000 + 10000000L).as("ts"))
    // every 3rd doc re-crawled later with case/whitespace noise — the
    // normalized fingerprint (q24's key) must catch it
    val recrawls = originals.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(upper(col("text")), lit("  ")).as("text"),
        timestamp_millis(col("doc_id") * 1000 + 10400000L).as("ts"))
    val minQuality = 0.0
    // batch twin: keep-first (earliest ts) per fingerprint, then the
    // same stateless gate
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(col("ts"))
    val batchOut = DocStream.qualityGate(
      originals.unionByName(recrawls)
        .withColumn("__fp", TextOps.fingerprint(col("text")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__fp", "__rn"),
      minQuality)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("doc_id"), md5(col("text")).as("h"),
        col("quality"), col("n_tokens"))
      .as[(Long, String, Double, Int)].collect().toSet
    val want = key(batchOut)
    // stream: originals first, re-crawls in a later micro-batch (their
    // event times are later; batch order pins which copy wins)
    implicit val sq = spark.sqlContext
    val source = MemoryStream[Doc]
    val q = DocStream.intake(source.toDF(), minQuality, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("intake_corpus")
      .outputMode("append").start()
    source.addData(originals.as[Doc].collect().toIndexedSeq)
    q.processAllAvailable()
    source.addData(recrawls.as[Doc].collect().toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = key(spark.table("intake_corpus"))
    assert(got.map(_._1) === want.map(_._1),
      "stream intake must keep exactly the batch pipeline's id set")
    assert(got === want,
      "redacted text, quality and token count must match the batch expressions")
  }

  test("driftCells: stream cells over the real corpus re-aggregate to the exact batch count table") {
    // The mergeable-pre-aggregate property that makes the drift
    // monitor incremental: per-window (source, token) cells, summed
    // over windows, must equal the one-shot batch tokenize counts —
    // exactly, on the real corpus, under out-of-order multi-batch
    // arrival spread across several windows.
    implicit val sq = spark.sqlContext
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val timed = docs.select(col("doc_id"), col("text"), col("source"),
      // spread deterministically over 3 hourly windows, decorrelated
      // from doc_id order so arrival is genuinely out-of-window-order
      timestamp_millis(pmod(col("doc_id") * 2654435761L, lit(3)) * 3600000L
        + 1000000000L).as("ts"))
    val rows = timed.as[SDoc].collect().toIndexedSeq
    val source = MemoryStream[SDoc]
    // delay must cover the 2-hour fixture spread: interleaved arrival
    // means early-window rows land after the watermark has advanced
    // past them under a shorter delay (they would be DROPPED as late —
    // the correct streaming semantics, but not this test's subject)
    val q = DocStream.driftCells(source.toDF(), windowMinutes = 60,
        watermarkDelay = "4 hours")
      .writeStream.format("memory").queryName("drift_cells")
      .outputMode("append").start()
    rows.grouped(200).foreach { chunk =>
      source.addData(chunk); q.processAllAvailable()
    }
    source.addData(SDoc(-1L, "watermark mover sentinel", "s", ts(100000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("drift_cells").filter(col("source") =!= "s")
      .groupBy(col("source"), col("tok")).agg(sum(col("c")).as("c"))
      .as[(String, String, Long)].collect().toSet
    val want = docs
      .select(col("source"),
        explode(graft.llm.TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect().toSet
    assert(got === want)
    assert(spark.table("drift_cells").filter(col("source") =!= "s")
      .select(col("window_start")).distinct().count() === 3,
      "fixture must actually exercise several windows")
  }

  test("sourceQualityTimeline: stream equals the batch q151 report on closed days") {
    implicit val sq = spark.sqlContext
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // real sf0.001 docs, synthetic day-spread timestamps. Day modulus
    // 3 is COPRIME to the source modulus (20), so every source spans
    // all three days — a day-aligned modulus would leave each source
    // on a single day and nothing would ever close.
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val rows = t.documents.select("doc_id", "text", "source").collect()
      .map(r => SDoc(r.getLong(0), r.getString(1), r.getString(2),
        new Timestamp(((r.getLong(0) % 3) * 86400L + r.getLong(0) % 7) * 1000L)))
      .sortBy(d => (d.ts.getTime, d.doc_id))
    def dayOf(d: SDoc): Long = Math.floorDiv(d.ts.getTime / 1000L, 86400L)
    val days = rows.map(dayOf)
    // replay contract (day-granular): rows sharing a DAY stay in one
    // micro-batch run; split near thirds at day boundaries
    def cutAfter(i0: Int): Int = {
      var i = i0
      while (i < rows.length - 1 && days(i + 1) == days(i)) i += 1
      i + 1
    }
    val c1 = cutAfter(rows.length / 3); val c2 = cutAfter(2 * rows.length / 3)
    val chunks = Seq(rows.slice(0, c1), rows.slice(c1, c2), rows.slice(c2, rows.length))
    val source = MemoryStream[SDoc]
    val q = DocStream.sourceQualityTimeline(source.toDF()).writeStream
      .format("memory").queryName("srcquality").outputMode("append").start()
    chunks.foreach { c => source.addData(c.toIndexedSeq: _*); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("srcquality")
      .as[(String, Long, Long, Double, Long, Double)].collect().toSeq.sorted
    // batch reference: the SAME quality scores (both sides consume
    // TextOps.qualityScore), q151's exact integer report arithmetic
    // over each source's cumulative histogram at each CLOSED day
    val scored = rows.toSeq.toDF()
      .select(col("source"), col("ts"),
        graft.llm.TextOps.qualityScore(col("text")).cast("long").as("q"))
      .collect().map(r => (r.getString(0),
        Math.floorDiv(r.getTimestamp(1).getTime / 1000L, 86400L), r.getLong(2)))
    def report(src: String, d: Long): (String, Long, Long, Double, Long, Double) = {
      val qs = scored.filter(x => x._1 == src && x._2 <= d).map(_._3)
      val n = qs.length.toLong
      val sq = qs.sum
      val junk = qs.count(_ < 7).toLong
      val hist = qs.groupBy(identity).view.mapValues(_.length.toLong)
      val p50 = hist.keys.toSeq.sorted
        .foldLeft((0L, Option.empty[Long])) { case ((cum, found), qv) =>
          val c2 = cum + hist(qv)
          (c2, found.orElse(if (c2 * 2 >= n) Some(qv) else None))
        }._2.get
      (src, d, n, r9(sq.toDouble / n), p50, r9(junk.toDouble / n))
    }
    val batch = scored.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      val ds = xs.map(_._2).distinct.sorted
      ds.dropRight(1).map(d => report(src, d)) // the final open day has no point
    }.sorted
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.map(_._1).distinct.size > 1 &&
      streamed.map(_._2).distinct.size > 1,
      "fixture must exercise several sources and several closed days")
  }

  test("spanProbeFlags: stream equals the batch probe against the persisted gram index") {
    // the 17th stream-=-batch twin (round-16 verdict item 8): base
    // corpus -> persisted gram index; the feed plants verbatim copies
    // (must flag), fully rewritten docs (must pass), and one doc whose
    // only duplication is WITHIN the feed (must pass - the gate probes
    // the index, not the live window; q162's batchDup half owns that).
    implicit val sq = spark.sqlContext
    val L = 8
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val idx = graft.llm.ExactSubstr.gramTable(base, L)
      .select("gram").distinct().localCheckpoint()
    def pref(p: String) = regexp_replace(col("text"), "(\\S+)", p + "$1")
    val feed = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))       // copy: flag
      .unionByName(base.filter(col("doc_id") % 7 === 1)
        .select((col("doc_id") + 600000L).as("doc_id"), pref("zz").as("text"))) // novel: pass
      .unionByName(base.filter(col("doc_id") % 7 === 2).limit(1)
        .select((col("doc_id") + 700000L).as("doc_id"), pref("yy").as("text"))) // feed-dup a
      .unionByName(base.filter(col("doc_id") % 7 === 2).limit(1)
        .select((col("doc_id") + 710000L).as("doc_id"), pref("yy").as("text"))) // feed-dup b
      .withColumn("ts", timestamp_millis(col("doc_id") * 1000L))
    // batch twin: the identical plan in batch mode
    val want = DocStream.spanProbeFlags(feed, idx, L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // and the first-principles batch probe: ids whose gram hits the index
    val direct = graft.llm.ExactSubstr.gramTable(feed, L)
      .join(idx, Seq("gram"), "left_semi")
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(want == direct, "batch-mode gate must equal the direct probe")
    val source = MemoryStream[DocStreamSpec.Doc]
    val q = DocStream.spanProbeFlags(source.toDF(), idx, L)
      .writeStream.format("memory").queryName("spanflags")
      .outputMode("append").start()
    source.addData(feed.select("doc_id", "text", "ts")
      .as[DocStreamSpec.Doc].collect().toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("spanflags").select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(id => id >= 500000L && id < 600000L),
      s"exactly the verbatim copies must flag: $got")
    assert(!got.exists(_ >= 700000L),
      "feed-internal duplicates must pass (index probe only)")
  }

  test("semDedupFlags: stream equals batch equals semDedupAppend's corpus half") {
    // the 18th stream-=-batch twin: corpus + pinned centroids -> the
    // persisted decision table; the feed plants light re-perturbations
    // of corpus vectors (must flag) and reversed vectors (novel
    // geometry - must pass). No in-feed duplicates, so the batch
    // semDedupAppend's dropped set IS the expected flag set.
    implicit val sq = spark.sqlContext
    import graft.llm.Similarity
    val tau = 0.99
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val cents = base.filter(col("vec_id") < 16)
    val corpusAsg = Similarity.semDedupClustered(base, cents, tau,
        centroidIdCol = "vec_id")
      .select("vec_id", "cluster_id").localCheckpoint()
    val feed = base
      .select(col("vec_id"),
        transform(col("embedding"),
          (x, i) => x + lit(0.002) *
            (pmod(col("vec_id") + i.cast("bigint"), lit(3)) - 1).cast("double"))
          .as("embedding"))
      .filter(pmod(col("vec_id"), lit(5)) === 0)
      .select((col("vec_id") + 800000L).as("vec_id"), col("embedding"))
      .unionByName(base.filter(pmod(col("vec_id"), lit(5)) === 1)
        .select((col("vec_id") + 810000L).as("vec_id"),
          reverse(col("embedding")).as("embedding")))
      .withColumn("ts", timestamp_millis(col("vec_id") * 1000L))
    // batch twin: identical plan in batch mode
    val want = DocStream.semDedupFlags(feed, corpusAsg, base, cents, tau,
        centroidIdCol = "vec_id")
      .select("vec_id").as[Long].collect().sorted.toSeq
    // the batch operator's corpus-caused drops (no in-feed dups planted)
    val appendDropped = Similarity.semDedupAppend(feed.drop("ts"),
        corpusAsg, base, cents, tau, centroidIdCol = "vec_id")
      .filter(!col("keep")).select("vec_id").as[Long].collect().sorted.toSeq
    assert(want == appendDropped,
      "gate must flag exactly the vectors the batch append drops")
    val source = MemoryStream[DocStreamSpec.Vec]
    val q = DocStream.semDedupFlags(source.toDF(), corpusAsg, base, cents,
        tau, centroidIdCol = "vec_id")
      .writeStream.format("memory").queryName("semflags")
      .outputMode("append").start()
    source.addData(feed.select("vec_id", "embedding", "ts")
      .as[DocStreamSpec.Vec].collect().toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("semflags").select("vec_id")
      .as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(id => id >= 800000L && id < 810000L),
      s"exactly the perturbed twins must flag: got $got")
  }

  test("releaseGate: composed intake-to-release, stream ≡ batch") {
    // the 21st stream-≡-batch twin (round-16 verdict item 4): the
    // q185 gating stages composed in ONE stream — exact-dup keep-first
    // → margin gate → bench span probe — on a planted corpus holding
    // every rejection class: an exact duplicate (dedup state), a
    // negative-margin doc (model gate), a bench-quoting doc (span
    // probe → quarantine), and two clean docs (release rows with
    // q185's md5 anchors).
    implicit val sq = spark.sqlContext
    val L = 4
    val bench = Seq((900L, "benchq alpha beta gamma delta answertok"))
      .toDF("doc_id", "text")
    val benchGrams = graft.llm.ExactSubstr.gramTable(bench, L)
      .select("gram").distinct().as[String].collect().toSet
    val junk = "zzz qqq vvv xxx" // stand-in margin −595
    val quote = body + " alpha beta gamma delta end" // margin +, quotes bench
    val tail5 = body + " plus a genuinely different ending"
    val docs = Seq(
      Doc(1, body, ts(1)),   // clean → release
      Doc(2, junk, ts(2)),   // negative margin → gate rejects
      Doc(3, quote, ts(3)),  // bench quote → quarantine (probe)
      Doc(4, body, ts(4)),   // exact duplicate of 1 → dedup drops
      Doc(5, tail5, ts(5)))  // clean → release
    // fixture preconditions (fail loudly if the plants drift)
    val margins = graft.llm.QualityModel.scoreDocs(docs.toDF())
      .select("doc_id", "margin_milli").as[(Long, Long)].collect().toMap
    assert(margins(2L) < 0 && Seq(1L, 3L, 5L).forall(margins(_) >= 0),
      s"planted margins drifted: $margins")
    // batch twin: identical composition in batch mode
    val want = DocStream.releaseGate(docs.toDF(), benchGrams, L)
      .select("doc_id", "clean_md5", "shard")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val source = MemoryStream[Doc]
    val q = DocStream.releaseGate(source.toDF(), benchGrams, L)
      .writeStream.format("memory").queryName("releasegate")
      .outputMode("append").start()
    source.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("releasegate")
      .select("doc_id", "clean_md5", "shard")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == want, "stream must equal the batch composition")
    assert(got.map(_._1) == Seq(1L, 5L),
      s"exactly the clean non-duplicate docs release: $got")
    // release anchors match q185's formula on the released text
    val anchors = docs.filter(d => Seq(1L, 5L).contains(d.doc_id))
      .map(d => d.doc_id -> d.text).toMap
    got.foreach { case (id, m, shard) =>
      val ref = java.security.MessageDigest.getInstance("MD5")
        .digest(anchors(id).getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(m === ref, s"doc $id clean_md5")
      assert(shard === java.lang.Long.parseLong(ref.take(8), 16) % 8,
        s"doc $id shard")
    }
  }
}
