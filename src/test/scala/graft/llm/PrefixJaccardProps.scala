package graft.llm

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized equality of the prefix-filter exact join with the O(n²)
  * oracle: small vocabularies (maximally shared shingles — the
  * candidate filters' worst case), repetition-heavy docs (duplicate
  * shingles exercise the distinct-set semantics), and threshold edges.
  * The completeness THEOREM (first common shingle in both prefixes,
  * positional bound admits it) has to survive every draw.
  */
object PrefixJaccardProps extends Properties("prefixJaccard") {
  import org.apache.spark.sql.functions._

  private lazy val spark = {
    val s = graft.SparkSpec.session
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // each case runs a handful of Spark jobs — keep the draw count modest
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  // tiny vocabulary => dense shingle sharing => worst case for the
  // prefix join's pruning AND richest qualifying-pair structure
  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")

  private val doc: Gen[String] = Gen.chooseNum(0, 25)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(2, 18).flatMap(n => Gen.listOfN(n, doc))

  private val thresholdGen: Gen[Double] = Gen.oneOf(0.3, 0.5, 0.8, 1.0)

  property("pair set and jaccard values equal the exact all-pairs oracle") =
    Prop.forAll(corpusGen, thresholdGen) { (docs, t) =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        .toDF("doc_id", "text")
      def key(r: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = r
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("j"))
        .as[(Long, Long, Double)].collect().toSet
      val exact = key(NearDup.exactJaccardPairs(df, "doc_id", "text", t))
      val pf = key(NearDup.prefixJaccardPairs(df, "doc_id", "text", t))
      Prop(pf == exact) :|
        s"threshold $t: prefix ${pf.size} vs exact ${exact.size} over ${docs.size} docs"
    }
}
