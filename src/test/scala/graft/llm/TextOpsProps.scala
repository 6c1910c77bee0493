package graft.llm

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Generator-based properties for the corpus ops: each checks the
  * Spark implementation against an INDEPENDENT driver-side
  * recomputation on randomized inputs (the first use of the project's
  * scalacheck dependency — example specs pin known answers, these pin
  * the algebra).
  */
object TextOpsProps extends Properties("textops") {
  import org.apache.spark.sql.functions._

  private lazy val spark = {
    val s = graft.SparkSpec.session
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // Spark jobs per case are not free — 10 randomized cases per property
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val word: Gen[String] = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val doc: Gen[String] = Gen.chooseNum(0, 40)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  /** winnowing guarantee: any shared normalized substring of length
    * >= k + w - 1 forces a shared fingerprint — on RANDOM docs with a
    * RANDOM planted overlap, not just the fixed example.
    */
  property("winnowing shared-substring guarantee") = {
    // the guarantee needs a shared NORMALIZED substring of length
    // >= k + w - 1 = 11: four words of >= 3 chars give >= 15 (a first
    // draft allowed 1-char words — min 7 — and scalacheck promptly
    // falsified it; the guarantee's bound is sharp)
    val longWord: Gen[String] = Gen.chooseNum(3, 8)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val gen = for {
      a <- doc; b <- doc
      shared <- Gen.listOfN(4, longWord).map(_.mkString(" "))
    } yield (s"$a $shared $b", s"$b $shared $a")
    Prop.forAllNoShrink(gen) { case (d1, d2) =>
      val spark2 = spark
      import spark2.implicits._
      def fps(t: String): Set[String] =
        Seq(t).toDF("text")
          .select(TextOps.winnowingFingerprints(col("text"), 8, 4).as("f"))
          .head().getSeq[String](0).toSet
      fps(d1).intersect(fps(d2)).nonEmpty
    }
  }

  /** stratifiedSample: the kept SET equals an independent driver-side
    * md5-prefix computation, exactly.
    */
  property("stratifiedSample set = driver md5-prefix recomputation") = {
    val gen = for {
      docs <- Gen.listOfN(60, doc)
      bound <- Gen.oneOf("20", "40", "80", "c0")
    } yield (docs, bound)
    Prop.forAllNoShrink(gen) { case (docs, bound) =>
      val spark2 = spark
      import spark2.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
        .toDF("doc_id", "text", "lang")
      val got = TextOps.stratifiedSample(df, "text", "lang", Map("en" -> bound))
        .select("doc_id").as[Long].collect().toSet
      val md = java.security.MessageDigest.getInstance("MD5")
      val want = docs.zipWithIndex.collect {
        case (t, i) if {
          md.reset()
          val hex = md.digest(t.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.substring(0, 2)
          hex < bound
        } => i.toLong
      }.toSet
      got == want
    }
  }

  /** packSequences: window arithmetic equals a driver-side prefix-sum
    * recomputation on random token counts.
    */
  property("packSequences = driver prefix-sum recomputation") = {
    val gen = Gen.listOfN(30, doc)
    Prop.forAllNoShrink(gen) { docs =>
      val spark2 = spark
      import spark2.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextOps.packSequences(df, "doc_id", "text", windowTokens = 7)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val counts = docs.map(t => if (t.trim.isEmpty) 0L else t.trim.split("\\s+").length.toLong)
      var off = 0L
      val want = counts.zipWithIndex.map { case (n, i) =>
        val start = off / 7
        val span = if (n == 0) 1L else (off + n - 1) / 7 - start + 1
        off += n
        (i.toLong, n, start, span)
      }
      got.toSeq == want
    }
  }

  /** stripBoilerplate counts equal a driver-side line-df recomputation. */
  property("stripBoilerplate = driver line-df recomputation") = {
    // lines drawn from a SMALL pool so document-frequency collisions
    // actually happen; threshold in the middle of the df range
    val line: Gen[String] = Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val gen = Gen.listOfN(12, Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, line).map(_.mkString("\n"))))
    Prop.forAllNoShrink(gen) { docs =>
      val spark2 = spark
      import spark2.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextOps.stripBoilerplate(df, "doc_id", "text", maxDfFraction = 0.4)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val dfOf = docs.zipWithIndex
        .flatMap { case (t, i) => t.split("\n").distinct.map(_ -> i) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.size }
      val bar = 0.4 * docs.size
      val want = docs.zipWithIndex.map { case (t, i) =>
        val ls = t.split("\n")
        (i.toLong, ls.length.toLong,
          ls.count(l => dfOf(l) <= bar).toLong)
      }
      got == want
    }
  }

  /** md5-SimHash: the native expression equals an INDEPENDENT driver
    * recomputation (JDK MessageDigest, not Spark's md5) on random
    * docs, and the signature is invariant under token-order
    * permutation (votes are a multiset sum) — the two facts the q78
    * oracle leans on.
    */
  property("simhashMd5 = driver md5-vote recomputation; order-invariant") = {
    def driverSig(text: String): Long = {
      val toks = text.trim match {
        case "" => Array.empty[String]
        case t  => t.split("\\s+")
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](60)
      toks.foreach { tok =>
        val d = md.digest(tok.getBytes("UTF-8"))
        val h = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL)) >>> 4
        (0 until 60).foreach(b => if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1)
      }
      (0 until 60).foldLeft(0L)((s, b) => if (votes(b) > 0) s | (1L << b) else s)
    }
    val gen = for {
      d <- doc
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (d, new scala.util.Random(seed))
    Prop.forAllNoShrink(gen) { case (d, rnd) =>
      val spark2 = spark
      import spark2.implicits._
      val shuffled = rnd.shuffle(d.trim.split("\\s+").toSeq.filter(_.nonEmpty)).mkString(" ")
      val got = Seq(d, shuffled).toDF("text")
        .select(NearDup.simhashMd5(col("text")).as("s"))
        .collect().map(_.getLong(0))
      got(0) == driverSig(d) && got(1) == got(0)
    }
  }
}
