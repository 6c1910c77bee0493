package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[BpeTrain.learnMerges]] against hand-computed greedy BPE on
  * planted mini-corpora: the pair statistic, the (count DESC, a ASC,
  * b ASC) tie-break, early exhaustion, and the learned-table →
  * [[Bpe.tokenCountWith]] round trip.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) = texts.toSeq.toDF("text")

  test("greedy merges match a hand trace (counts weighted by word frequency)") {
    // words: aa ×3, ab ×2, b ×1
    //   round 0 pairs: (a,a) -> 3 (one adjacent occurrence per 'aa'),
    //                  (a,b) -> 2          => merge (a,a), cnt 3
    //   round 1: 'aa' is |aa|, pairs: (a,b) -> 2 => merge (a,b), cnt 2
    //   round 2: no pairs left => early stop
    val wc = BpeTrain.wordCounts(corpus("aa ab aa", "ab aa b"))
    val learned = BpeTrain.learnMerges(wc, k = 5)
    assert(learned == Seq(
      BpeTrain.LearnedMerge(0, "a", "a", 3),
      BpeTrain.LearnedMerge(1, "a", "b", 2)))
  }

  test("overlapping runs: adjacent-occurrence counting and non-overlapping replace") {
    // 'aaa' ×1: round 0 counts (a,a) twice (positions 1-2 and 2-3);
    // the merge replaces left-to-right non-overlapping: |aa||a|.
    // round 1: pair (aa,a) ×1 => merge (aa,a).
    val wc = BpeTrain.wordCounts(corpus("aaa"))
    val learned = BpeTrain.learnMerges(wc, k = 5)
    assert(learned == Seq(
      BpeTrain.LearnedMerge(0, "a", "a", 2),
      BpeTrain.LearnedMerge(1, "aa", "a", 1)))
  }

  test("ties break by (a ASC, b ASC) under binary string order") {
    // xy ×1, yx ×1: (x,y) -> 1 and (y,x) -> 1 tie; 'x' < 'y' picks (x,y)
    val wc = BpeTrain.wordCounts(corpus("xy yx"))
    val learned = BpeTrain.learnMerges(wc, k = 1)
    assert(learned == Seq(BpeTrain.LearnedMerge(0, "x", "y", 1)))
  }

  test("learned table drives tokenization via Bpe.tokenCountWith") {
    val docs = corpus("aa ab aa", "ab aa b")
    val learned = BpeTrain.learnMerges(BpeTrain.wordCounts(docs), k = 5)
    val merges = learned.map(m => (m.a, m.b))
    // after (a,a) and (a,b): 'aa' -> 1 token, 'ab' -> 1, 'b' -> 1
    val counts = docs.select(Bpe.tokenCountWith(merges, col("text")).as("n"))
      .as[Long].collect().toSeq
    assert(counts == Seq(3L, 3L))
  }

  test("wordCounts rejects reserved delimiters loudly") {
    val ex = intercept[Exception] {
      BpeTrain.wordCounts(corpus("fine text", "bad|text")).collect()
    }
    assert(ex.getMessage.contains("reserved delimiter") ||
      Option(ex.getCause).exists(_.getMessage.contains("reserved delimiter")))
  }

  test("learned tables are consistent: symbolsWith accepts them") {
    // a merge table whose later operands are earlier outputs must pass
    // Bpe's consistency require when learned (constructive property)
    val wc = BpeTrain.wordCounts(corpus("the the then than that"))
    val learned = BpeTrain.learnMerges(wc, k = 8)
    val merges = learned.map(m => (m.a, m.b))
    // must not throw, and counts are positive
    val n = corpus("the than").select(Bpe.tokenCountWith(merges, col("text")).as("n"))
      .as[Long].collect()
    assert(n.forall(_ > 0))
  }

  test("gated local path ≡ distributed loop, including non-ASCII symbols") {
    // multi-byte code points exercise BOTH local-path edges: the
    // code-point symbol split (the `(.)` regex unit) and the UTF-8
    // byte-order tie-break
    val c = corpus("的是 的是 的的是", "ab ab 的b", "xy xy xy")
    val wc = BpeTrain.wordCounts(c).localCheckpoint()
    val local = BpeTrain.learnMerges(wc, k = 6) // gated → local (tiny dict)
    val dist = BpeTrain.learnMergesDistributed(wc, k = 6)
    assert(local === dist)
    assert(local.nonEmpty)
  }

  test("supplementary code points train, re-apply, and bill (round-17 ADVICE)") {
    // 😀 (U+1F600) and 𠀀 (U+20000, CJK Ext-B) are ONE code point but
    // String.length == 2 — the old UTF-16-length consistency test in
    // Bpe.foldMerges rejected any learned merge with such an operand,
    // so learnMergesDistributed crashed at round 2 (pairCounts →
    // symbolsOfWord replays round-1 merges) and learned tables from
    // such corpora were unusable in tokenCountWith. This pins the
    // whole loop: train (both gated paths), replay, bill.
    // words: 😀😀 ×1, 😀a ×1, 𠀀b ×2
    //   round 0: (𠀀,b) ×2 wins                       => (𠀀, b, 2)
    //   round 1: (😀,😀) ×1 ties (😀,a) ×1; right operand breaks it
    //            under UTF-8 bytes: 'a'=0x61 < 😀=F0.. => (😀, a, 1)
    //   round 2: only (😀,😀) ×1 remains               => (😀, 😀, 1)
    //   round 3: no pairs left => early stop at 3 merges
    val c = corpus("😀😀 😀a", "𠀀b 𠀀b")
    val wc = BpeTrain.wordCounts(c).localCheckpoint()
    val local = BpeTrain.learnMerges(wc, k = 4)
    val dist = BpeTrain.learnMergesDistributed(wc, k = 4)
    assert(local === dist)
    assert(local == Seq(
      BpeTrain.LearnedMerge(0, "𠀀", "b", 2),
      BpeTrain.LearnedMerge(1, "😀", "a", 1),
      BpeTrain.LearnedMerge(2, "😀", "😀", 1)))
    // the learned table (supplementary operands throughout) must pass
    // foldMerges' consistency check and bill end-to-end: every word
    // above merges to exactly ONE token, so each text bills 2
    val merges = local.map(m => (m.a, m.b))
    val n = c.select(Bpe.tokenCountWith(merges, col("text")).as("n"))
      .as[Long].collect().toSeq
    assert(n == Seq(2L, 2L))
  }

  test("dictionary merge ≡ rebuild over the union corpus (q197's contract)") {
    val a = corpus("the theme", "than the")
    val b = corpus("the thin", "nvnew nvnew")
    val merged = BpeTrain.mergeDicts(
        BpeTrain.wordCounts(a), BpeTrain.wordCounts(b))
      .as[(String, Long)].collect().toMap
    val rebuilt = BpeTrain.wordCounts(a.unionByName(b))
      .as[(String, Long)].collect().toMap
    assert(merged === rebuilt)
    // and the refit merges over the merged dictionary equal the
    // from-scratch training on the union corpus
    val viaMerge = BpeTrain.learnMerges(BpeTrain.mergeDicts(
      BpeTrain.wordCounts(a), BpeTrain.wordCounts(b)), k = 4)
    val viaRebuild = BpeTrain.learnMerges(
      BpeTrain.wordCounts(a.unionByName(b)), k = 4)
    assert(viaMerge === viaRebuild)
  }
}
