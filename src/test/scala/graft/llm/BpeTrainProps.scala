package graft.llm

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized equality of the distributed greedy merge learner with a
  * straightforward JVM reference: for ANY corpus draw, every round's
  * (pair argmax, count) must match an in-memory greedy BPE that counts
  * adjacent pairs over the word-frequency dictionary with the same
  * non-overlapping occurrence rule and the same (count DESC, a ASC,
  * b ASC) tie-break. Small alphabets force dense pair ties (the
  * tie-break's worst case) and repeated letters force the overlap
  * rule ("aaa" is ONE "aa" occurrence) to matter.
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

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
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
    var dict: Map[Vector[String], Long] = texts
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) =>
        w.map(_.toString).toVector -> xs.size.toLong
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
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
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
