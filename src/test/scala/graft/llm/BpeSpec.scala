package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The chained-replace BPE must equal an INDEPENDENT one-merge-at-a-
  * time greedy reference (leftmost occurrence of the lowest applicable
  * rank, repeated to fixpoint) — the textbook algorithm the
  * rank-ascending pass claims to implement exactly (valid because the
  * merge table is consistent; this spec is the empirical pin).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val rankOf = Bpe.Merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  /** Canonical greedy BPE: repeatedly merge the leftmost occurrence of
    * the lowest-ranked applicable pair.
    */
  private def greedyWith(ranks: Map[(String, String), Int])(word: String): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      val cands = (0 until syms.length - 1)
        .flatMap(i => ranks.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (cands.isEmpty) done = true
      else {
        val (r, i) = cands.min
        syms = syms.take(i) :+ (syms(i) + syms(i + 1)) :++ syms.drop(i + 2)
      }
    }
    syms
  }

  private def greedy(word: String): Vector[String] = greedyWith(rankOf)(word)

  private def greedyCount(text: String): Long =
    text.trim.split("\\s+").filter(_.nonEmpty).map(w => greedy(w).length.toLong).sum

  private def corpusWords: Seq[String] = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .distinct().as[String].collect().toSeq
  }

  test("hand-traced words: multi-level merge chains resolve fully") {
    val got = Seq("table", "the", "scan", "sort", "stream", "order", "window")
      .toDF("text").select(col("text"), Bpe.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("table") === 1L) // t+a, ta+b, tab+le (l+e)
    assert(got("the") === 1L)   // t+h, th+e
    assert(got("scan") === 1L)  // a+n, c+an, s+can
    assert(got("sort") === 1L)  // o+r, or+t, s+ort
    assert(got("stream") === 3L) // st, re, am
    got.foreach { case (w, n) => assert(n === greedy(w).length.toLong, w) }
  }

  test("equals the greedy reference on every corpus word and on random strings") {
    val words = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    val rng = new scala.util.Random(11)
    val fuzz = Vector.fill(300)(
      (0 until 1 + rng.nextInt(12)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    val all = (words.toVector ++ fuzz).distinct
    val got = all.toDF("text")
      .select(col("text"), Bpe.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    all.foreach(w => assert(got(w) === greedyCount(w), s"word '$w'"))
  }

  test("multi-word text sums per-word counts; empty text is zero") {
    val got = Seq("the table scan", "", "   ").toDF("text")
      .select(Bpe.tokenCount(col("text")).as("n")).as[Long].collect()
    assert(got(0) === greedyCount("the table scan"))
    assert(got(1) === 0L && got(2) === 0L)
  }

  test("reserved delimiters fail loudly") {
    val e = intercept[Exception](
      Seq("bad|text").toDF("text").select(Bpe.tokenCount(col("text"))).collect())
    assert(e.getMessage.contains("Bpe") ||
      Option(e.getCause).exists(_.getMessage.contains("Bpe")))
  }

  test("TableMerges: 50k merges, consistent, deterministic, curated prefix") {
    val v = Bpe.TableMerges
    assert(v.length === 50000)
    assert(v.take(Bpe.Merges.length) === Bpe.Merges)
    // consistency: every operand is a base char or an earlier output —
    // the precondition of the greedy ≡ ascending-replay theorem the
    // DuckDB oracle leans on
    val outputs = scala.collection.mutable.Set.empty[String]
    v.foreach { case (a, b) =>
      Seq(a, b).foreach(s => assert(s.length == 1 || outputs.contains(s),
        s"inconsistent operand '$s'"))
      assert(a.length + b.length <= Bpe.TableMaxLen)
      outputs += a + b
    }
    assert(v.distinct.length === v.length, "duplicate merge pair")
    // pure-integer generation: a second build is identical
    assert(Bpe.syntheticVocab(50000) === v)
  }

  test("native greedy encoder equals the reference at full table size") {
    val vocab = new BpeVocab(Bpe.TableMerges.toArray, Bpe.TableMaxLen)
    val tableRanks = Bpe.TableMerges.zipWithIndex
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).min }
    val rng = new scala.util.Random(23)
    val fuzz = Vector.fill(400)(
      (0 until 1 + rng.nextInt(14)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    (corpusWords ++ fuzz).distinct.foreach { w =>
      val want = greedyWith(tableRanks)(w)
      assert(vocab.encode(w).toVector === want, s"word '$w'")
      assert(vocab.countWord(w) === want.length.toLong, s"count '$w'")
    }
  }

  test("broadcast-table expression equals the driver-side encoder on the corpus") {
    import spark.implicits._
    val vocab = new BpeVocab(Bpe.TableMerges.toArray, Bpe.TableMaxLen)
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).as[String].collect().toSeq :+ "" :+ "   "
    val got = texts.toDF("text")
      .select(col("text"), Bpe.tableTokenCount(spark, col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    got.foreach { case (t, n) => assert(n === vocab.countText(t), s"text '${t.take(40)}'") }
  }

  test("vocab encoder: code-point symbols + \\S+ word unit (round-18 review)") {
    val vocab = new BpeVocab(Bpe.TableMerges.toArray, Bpe.TableMaxLen)
    // supplementary char = ONE base symbol (U+1D11E), the same unit as
    // the replace chain's [^#]/(?s)(.) symbolizers — the old UTF-16
    // charAt split billed 2 and could never fire a supplementary merge
    val clef = new String(Character.toChars(0x1D11E))
    assert(vocab.encode(clef).toVector === Vector(clef))
    assert(vocab.countWord(clef) === 1L)
    assert(vocab.encode(s"a${clef}b").toVector === Vector("a", clef, "b"))
    val supp = new BpeVocab(Array(clef -> clef), 8)
    assert(supp.encode(clef + clef).toVector === Vector(clef + clef))
    // word unit is the \S+ run — EXACTLY TextOps.tokens: U+0001 is not
    // whitespace (Java String.trim stripped it), and tab/newline edges
    // yield no phantom empty word
    assert(vocab.countText("\u0001ab") === vocab.countWord("\u0001ab"))
    assert(vocab.countText("\tab cd\n") === vocab.countWord("ab") + vocab.countWord("cd"))
    assert(vocab.countText("\n") === 0L)
    assert(vocab.countText("") === 0L)
  }

  test("under the 24-merge table the native encoder equals the replace chain") {
    import spark.implicits._
    val vocab = new BpeVocab(Bpe.Merges.toArray, Bpe.TableMaxLen)
    val texts = corpusWords.take(500)
    val chain = texts.toDF("text")
      .select(col("text"), Bpe.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    chain.foreach { case (t, n) => assert(n === vocab.countText(t), s"text '$t'") }
  }

  test("sql fragment equals the Spark chain on the corpus (via DuckDB-free recompute)") {
    // the SQL string is generated from the same Merges constant; pin
    // its shape so an accidental divergence in either generator fails
    val sql = Bpe.sqlTokenCount("toks")
    assert(sql.contains("'|t||h|', '|th|'"))
    assert(sql.contains("'|s||ort|', '|sort|'"))
    assert(Bpe.Merges.forall { case (a, b) => sql.contains(s"'|$a||$b|', '|$a$b|'") })
  }
}
