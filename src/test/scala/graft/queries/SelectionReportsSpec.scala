package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-16 report queries (q179–q182) against independent
  * recomputes on the sf0.001 corpus: the funnel's exact stages equal
  * distinct-count ground truth, the temperature mix matches a JVM
  * sqrt/round recompute bit-for-bit, and the calibration sweep equals
  * brute-force filtering of the q172 scorer.
  */
class SelectionReportsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q179 funnel: exact stages equal distinct-count ground truth") {
    val row = graft.SparkEntry.queries("q179_dedup_funnel")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().head
    val (nRaw, nExact, nFp, nNd, retention) = row
    val d = graft.Tables(spark, dir).documents
    val n = d.count()
    // corpus = docs + twins + verbatim copies (%10) + upper copies (%13)
    val nCopies = d.filter(pmod(col("doc_id"), lit(10)) === 0).count()
    val nUpper = d.filter(pmod(col("doc_id"), lit(13)) === 0).count()
    assert(nRaw === 2 * n + nCopies + nUpper)
    // exact stage: one representative per distinct md5 of the corpus —
    // verbatim copies collapse onto their originals
    assert(nExact === nRaw - nCopies,
      "every planted verbatim copy (and nothing else) drops at exact")
    // fingerprint stage: uppercased copies collapse onto originals
    assert(nFp === nExact - nUpper,
      "every planted uppercase copy (and nothing else) drops at fingerprint")
    // near-dup stage drops the truncated twins plus genuine
    // original-original near-dups (the synthetic corpus has them);
    // it must drop SOMETHING and never grow
    assert(nNd < nFp && nNd > 0)
    val r9 = BigDecimal(nNd.toDouble / nRaw)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(retention === r9)
  }

  test("q181 temperature mix matches the JVM sqrt/round recompute") {
    val got = graft.SparkEntry.queries("q181_temperature_mix")(spark, dir)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val counts = got.map { case (s, (nt, _, _)) => s -> nt }
    val total = counts.values.sum.toDouble
    def r9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nanos = counts.map { case (s, nt) =>
      s -> math.round(r9(math.sqrt(nt.toDouble / total)) * 1e9)
    }
    val z = nanos.values.sum.toDouble
    counts.foreach { case (s, nt) =>
      val (_, p, w) = got(s)
      assert(p === r9(nt.toDouble / total), s"source $s p")
      assert(w === r9(nanos(s) / z), s"source $s weight")
    }
    // weights form a distribution up to round-9 noise, and the sqrt
    // tempering flattens: every weight sits between p and uniform
    val wsum = got.values.map(_._3).sum
    assert(math.abs(wsum - 1.0) < 1e-6)
  }

  test("q182 calibration equals brute-force filtering of the scorer") {
    val got = graft.SparkEntry.queries("q182_quality_calibration")(spark, dir)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val scored = graft.llm.QualityModel
      .scoreDocs(graft.Tables(spark, dir).documents)
      .select(col("n_tokens"), col("margin_milli"))
      .as[(Long, Long)].collect()
    Seq(-200L, -100L, 0L, 100L, 200L).foreach { th =>
      val kept = scored.count { case (n, m) => m >= th * n }
      assert(got(th)._1 === kept.toLong, s"theta $th")
    }
    // monotone: raising the bar never keeps more
    val ks = Seq(-200L, -100L, 0L, 100L, 200L).map(got(_)._1)
    assert(ks === ks.sorted.reverse)
  }

  test("q185 release pipeline: gate drops, quotes cut, hosts survive, shard from content") {
    val out = graft.SparkEntry.queries("q185_release_pipeline")(spark, dir)
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val t = graft.Tables(spark, dir)
    // the pipeline's own gate recomputed directly: released ids =
    // exact-kept ∩ margin ≥ 0 (span cuts never remove documents)
    val train = t.documents
      .filter(pmod(col("doc_id"), lit(20)) =!= 0).count()
    assert(out.nonEmpty && out.size < train.toInt,
      "the margin gate must drop part of the corpus")
    // every released row's shard re-derives from its own md5 anchor
    out.values.foreach { case (_, md5hex, shard) =>
      val ref = java.lang.Long.parseLong(md5hex.take(8), 16) % 8
      assert(shard === ref)
    }
    // a released doc planted with the fixed benchmark question (id ≡ 3
    // mod 7 among train ids) must have its quote CUT: cleaned text is
    // shorter than the planted text but non-empty (host survives)
    val planted = out.keys.filter(id => id % 20 != 0 && id % 7 == 3)
    assert(planted.nonEmpty, "some planted-quote docs must clear the gate")
    val lens = t.documents.select(col("doc_id"), length(col("text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    planted.foreach { id =>
      val (cleanLen, _, _) = out(id)
      assert(cleanLen > 0, s"doc $id: host text must survive the cut")
      // with the quote cut, the cleaned text is the (whitespace-
      // normalized) host alone — never longer than the unplanted
      // original; an uncut quote would add its ~80 planted chars
      assert(cleanLen <= lens(id),
        s"doc $id: the planted quote must be cut")
    }
  }

  test("q186 retrieval eval: twin relevance metrics are consistent and non-vacuous") {
    val rows = graft.SparkEntry.queries("q186_retrieval_eval")(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(rows.keySet === Set("bm25", "ivf_pinned"))
    rows.foreach { case (name, (nq, h1, h5, h10, mrr)) =>
      assert(nq === 10L)
      assert(h1 <= h5 && h5 <= h10 && h10 <= 10L, s"$name hit monotonicity")
      assert(mrr >= h1 / 10.0 && mrr <= h10 / 10.0 + 1e-9, s"$name mrr bounds")
    }
    // perturbed twins sit at cosine ≈ 0.997 — the pinned-IVF side must
    // retrieve every source at rank 1 (else the eval itself is broken)
    assert(rows("ivf_pinned")._2 === 10L && rows("ivf_pinned")._5 === 1.0)
    assert(rows("bm25")._4 > 0L, "lexical side must find some sources")
  }

  test("q188 multi-benchmark attribution is exact on the disjoint plants") {
    val rows = graft.SparkEntry.queries("q188_multi_bench_decon")(spark, dir)
      .as[(String, String, Long, Long)].collect()
    val byBench = rows.groupBy(_._1)
    assert(byBench.keySet === Set("bench_a", "bench_b"))
    // every bench-B quote is one pure 8-token item with vocabulary
    // disjoint from everything else: exactly one 8-token island per
    // quoting doc — quoted_tokens ≡ 8 × docs, per source
    byBench("bench_b").foreach { case (_, src, docs, toks) =>
      assert(toks === 8 * docs, s"bench_b $src")
    }
    // and the flagged-doc totals equal the planted quoter counts
    val t = graft.Tables(spark, dir)
    val train = t.documents.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val bQuoters = train.filter(pmod(col("doc_id"), lit(11)) === 7).count()
    assert(byBench("bench_b").map(_._3).sum === bQuoters,
      "bench_b flags exactly the planted quoters")
    assert(byBench("bench_a").map(_._4).sum >
      byBench("bench_a").map(_._3).sum * 8,
      "bench_a spans include the 12-token question quotes")
  }

  test("q180 fertility: BPE cost at least one token per word, sums consistent") {
    val rows = graft.SparkEntry.queries("q180_bpe_fertility")(spark, dir)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, bpe, ws, chars, fert, cpb) =>
      assert(nDocs > 0 && bpe >= ws,
        s"$lang: every whitespace word costs >= 1 model token")
      assert(fert >= 1.0 && cpb > 0.0, s"$lang ratios")
    }
    val direct = {
      val t = graft.Tables(spark, dir)
      t.documents.select(
          graft.llm.Bpe.tableTokenCount(spark, col("text")).as("b"))
        .agg(sum(col("b"))).as[Long].collect().head
    }
    assert(rows.map(_._3).sum === direct,
      "per-lang BPE sums must re-add to the direct corpus total")
  }
}
