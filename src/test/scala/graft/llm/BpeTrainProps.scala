package graft.llm

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized equality of the distributed greedy merge learner with a
  * straightforward JVM reference: for ANY corpus draw, every round's
  * (pair argmax, count) must match an in-memory greedy BPE that counts
  * adjacent pairs over the word-frequency dictionary with the same
  * non-overlapping occurrence rule and the same (count DESC, a ASC,
  * b ASC) tie-break — operands ordered by UTF-8 BYTES, like
  * UTF8String and DuckDB memcmp. Small alphabets force dense pair
  * ties (the tie-break's worst case) and repeated letters force the
  * overlap rule ("aaa" is ONE "aa" occurrence) to matter. Since round
  * 18 the alphabet also draws multi-byte and SUPPLEMENTARY code
  * points (the round-17 ADVICE bug class): 的 (3-byte BMP),
  * ａ (high BMP, E0.. UTF-8) and an emoji (4-byte supplementary)
  * — the latter two ORDER DIFFERENTLY under UTF-16 vs UTF-8, so a
  * Java-String-ordered reference would silently diverge; the
  * reference splits by code point and compares raw UTF-8 bytes.
  */
object BpeTrainProps extends Properties("bpeTrain") {

  private lazy val spark = {
    val s = graft.SparkSpec.session
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // each case runs k Spark rounds — keep the draw count modest
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  // weight concentrates on a/b/c for dense ties; the three wide
  // symbols exercise code-point splitting and UTF-8-byte ordering
  private val sym: Gen[String] = Gen.frequency(
    4 -> Gen.const("a"), 4 -> Gen.const("b"), 3 -> Gen.const("c"),
    1 -> Gen.const("的"), 1 -> Gen.const("ａ"),
    1 -> Gen.const(new String(Character.toChars(0x1F600))))

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(n, sym)
  } yield cs.mkString

  private val corpus: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 10)
    ws <- Gen.listOfN(n, Gen.chooseNum(1, 5)
      .flatMap(m => Gen.listOfN(m, word).map(_.mkString(" "))))
  } yield ws

  /** In-memory greedy BPE over a (word, cnt) dictionary: symbols as
    * string vectors, adjacent-pair counts with LEFT-TO-RIGHT
    * non-overlapping occurrence counting, argmax by (count DESC,
    * a ASC, b ASC), merge applied non-overlapping left-to-right.
    */
  private def refMerges(texts: Seq[String], k: Int): Seq[(Long, String, String, Long)] = {
    def codePoints(w: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.result()
    }
    var dict: Map[Vector[String], Long] = texts
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) =>
        codePoints(w) -> xs.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    while (out.size < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + cnt
          // non-overlapping: "x x x" counts (x,x) twice here — the
          // distributed pairCounts counts EVERY adjacent index, so the
          // reference must too
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // UTF-8 byte order, NOT Java String order — they disagree on
        // supplementary vs high-BMP operands (surrogates sort low)
        def bytes(s: String): Seq[Int] = s.getBytes("UTF-8").map(_ & 0xff).toSeq
        import scala.math.Ordering.Implicits.seqOrdering
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((x, y), n) => (-n, bytes(x), bytes(y)) }.head
        out += ((out.size.toLong, a, b, c))
        dict = dict.toSeq.map { case (syms, cnt) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2 // non-overlapping left-to-right
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> cnt
        }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      }
    }
    out.toSeq
  }

  property("learnMerges (gated→local) == in-memory greedy reference") =
    Prop.forAll(corpus) { texts =>
      import spark.implicits._
      val wc = BpeTrain.wordCounts(texts.toDF("text"))
      val got = BpeTrain.learnMerges(wc, k = 5)
        .map(m => (m.rank, m.a, m.b, m.cnt))
      val want = refMerges(texts, k = 5)
      if (got != want)
        println(s"corpus=$texts\n got=$got\nwant=$want")
      got == want
    }

  property("learnMergesDistributed == in-memory greedy reference") =
    Prop.forAll(corpus) { texts =>
      import spark.implicits._
      val wc = BpeTrain.wordCounts(texts.toDF("text"))
      val got = BpeTrain.learnMergesDistributed(wc, k = 5)
        .map(m => (m.rank, m.a, m.b, m.cnt))
      val want = refMerges(texts, k = 5)
      if (got != want)
        println(s"corpus=$texts\n got=$got\nwant=$want")
      got == want
    }
}
