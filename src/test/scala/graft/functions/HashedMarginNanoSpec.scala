package graft.functions

import graft.SparkSpec
import graft.llm.{QualityModel, QualityWeights}
import org.apache.spark.sql.functions._

/** The native learned-margin expression must reproduce the builtin
  * composition exactly — it feeds the oracle-checked q191/q192/q196
  * and the 22nd streaming twin. Three angles: the typedLit-map fold
  * twin on real documents, a JVM reference over unicode edge tokens,
  * and the interpreted (non-codegen) path.
  */
class HashedMarginNanoSpec extends SparkSpec {
  import spark.implicits._

  /** A deterministic non-trivial weight table (not the fitted one —
    * the point is the lookup/fold machinery, not the fit).
    */
  private lazy val weights: QualityWeights = {
    val arr = Array.tabulate(QualityModel.NumBuckets)(b =>
      ((b * 2654435761L) % 4001L) - 2000L)
    new QualityWeights(arr)
  }

  /** Builtin twin: the same margin as a typedLit-map fold over the
    * token array (the O(width)-per-token shape the expression exists
    * to replace — slow, but exactly the contract).
    */
  private def builtinMargin(toks: org.apache.spark.sql.Column) = {
    val m = typedLit(weights.nano.zipWithIndex
      .map { case (w, b) => b.toLong -> w }.toMap)
    aggregate(
      transform(toks, t => coalesce(
        element_at(m, QualityModel.bucket(t)), lit(0L))),
      lit(0L), (acc, w) => acc + w)
  }

  test("native margin == builtin map-fold composition on sf0.01 documents") {
    val bc = spark.sparkContext.broadcast(weights)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), graft.llm.TextOps.tokens(col("text")).as("t"))
      .localCheckpoint()
    val native = docs.select(col("doc_id"),
        HashedMarginNano(col("t"), bc).as("m"))
      .as[(Long, Long)].collect().toMap
    val builtin = docs.select(col("doc_id"), builtinMargin(col("t")).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(native === builtin)
    assert(native.valuesIterator.exists(_ != 0L))
    docs.unpersist(blocking = false)
  }

  test("unicode and edge tokens match a JVM md5 reference") {
    val bc = spark.sparkContext.broadcast(weights)
    val cases: Seq[Seq[String]] = Seq(
      Seq("plain", "ascii", "words"),
      Seq("的", "是", "了"),                    // multi-byte CJK
      Seq("naïve", "Größe", "emoji❤"),    // latin diacritics + BMP symbol
      Seq("𝕏"),                                // surrogate pair (4-byte UTF-8)
      Seq(""),                                 // empty-string token
      Seq())                                   // empty array
    val got = cases.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }.toDF("id", "t")
      .select(col("id"), HashedMarginNano(col("t"), bc).as("m"))
      .as[(Long, Long)].collect().toMap
    def ref(ts: Seq[String]): Long = ts.map { tok =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      weights.nano((java.lang.Long.parseLong(hex.take(8), 16) %
        QualityModel.NumBuckets).toInt)
    }.sum
    cases.zipWithIndex.foreach { case (ts, i) =>
      assert(got(i.toLong) === ref(ts), s"case $i: $ts")
    }
  }

  test("interpreted (codegen-off) path matches the codegen'd one") {
    val bc = spark.sparkContext.broadcast(weights)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), graft.llm.TextOps.tokens(col("text")).as("t"))
      .localCheckpoint()
    val codegen = docs.select(col("doc_id"),
        HashedMarginNano(col("t"), bc).as("m"))
      .as[(Long, Long)].collect().toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = docs.select(col("doc_id"),
          HashedMarginNano(col("t"), bc).as("m"))
        .as[(Long, Long)].collect().toMap
      assert(interpreted === codegen)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    docs.unpersist(blocking = false)
  }

  test("null array in, null out; null tokens contribute zero") {
    val bc = spark.sparkContext.broadcast(weights)
    val rows = Seq((1L, Seq("aa", "bb")), (2L, null))
      .toDF("id", "t")
      .select(col("id"), HashedMarginNano(col("t"), bc).as("m"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(rows(2L).isEmpty, "null array must yield null margin")
    assert(rows(1L).nonEmpty)
    // a null ELEMENT contributes 0 (the join-form scorer drops it)
    val withNullTok = Seq(1L).toDF("id")
      .select(HashedMarginNano(
        array(lit("aa"), lit(null).cast("string"), lit("bb")), bc).as("m"))
      .as[Long].head()
    val noNullTok = Seq(1L).toDF("id")
      .select(HashedMarginNano(array(lit("aa"), lit("bb")), bc).as("m"))
      .as[Long].head()
    assert(withNullTok === noNullTok)
  }
}
