package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pluggable winnowing gram hash (TextOps.GramHasher): md5 is the
  * oracle-reproducible path (q38); XxHash64 is the production path —
  * the native one-pass WinnowHash expression (rolling XXH64 grams +
  * monotonic-deque window minimum). Same selection scheme, same
  * shared-substring guarantee; values bit-identical to the generic
  * builtin composition with xxhash64 grams.
  */
class WinnowingHashSpec extends SparkSpec {
  import spark.implicits._

  test("xxhash64 winnowing keeps the shared-substring guarantee") {
    val k = 8; val w = 4
    def fps(text: String): Set[Long] =
      Seq(text).toDF("text")
        .select(TextOps.winnowingFingerprints(col("text"), k, w,
          TextOps.GramHasher.XxHash64).as("v"))
        .collect()(0).getSeq[Long](0).toSet
    val shared = "a very distinctive copied passage sits here"
    val d1 = fps(s"completely unrelated preamble text then $shared and a tail")
    val d2 = fps(s"other document entirely $shared closing differently")
    assert(d1.intersect(d2).nonEmpty, "copied region must share a fingerprint")
    assert(fps(shared) === fps(shared)) // deterministic
    assert(fps("tiny") === Set.empty)   // shorter than k -> none
  }

  test("winnow_hash callable from SQL text and injected by GraftExtensions") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    graft.functions.WinnowHash.register(spark)
    Seq("abcdefghij").toDF("t").createOrReplaceTempView("wdocs")
    val viaSql = spark.sql("SELECT winnow_hash(t, 3, 2) AS fps FROM wdocs")
      .head().getSeq[Long](0)
    val viaCol = Seq("abcdefghij").toDF("t")
      .select(graft.functions.WinnowHash(col("t"), 3, 2).as("fps"))
      .head().getSeq[Long](0)
    assert(viaSql === viaCol && viaSql.nonEmpty)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val registry = org.apache.spark.sql.graftshim.ColumnShim
      .applyFunctionExtensions(ext,
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    assert(registry.functionExists(FunctionIdentifier("winnow_hash")))
    for (fn <- Seq("vec_dot", "minhash_sig", "simhash64", "winnow_md5", "word_shingles"))
      assert(registry.functionExists(FunctionIdentifier(fn)), s"$fn not injected")
    // the injected builders construct the native expressions
    import org.apache.spark.sql.catalyst.expressions.Literal
    val builtMd5 = registry.lookupFunction(FunctionIdentifier("winnow_md5"),
      Seq(Literal("abcdefghijkl"), Literal(8), Literal(4)))
    assert(builtMd5.isInstanceOf[graft.functions.WinnowMd5])
    val builtSh = registry.lookupFunction(FunctionIdentifier("word_shingles"),
      Seq(Literal("a b c d"), Literal(3)))
    assert(builtSh.isInstanceOf[graft.functions.WordShingles])
  }

  test("WinnowMd5: one expression instance is safe under concurrent compute") {
    // executor tasks each get their own deserialized copy, but one
    // DRIVER-side instance can be evaluated from several threads at once
    // (interpreted eval under Par.mapAll-style concurrency) — a digest
    // shared across threads corrupts silently; ThreadLocal isolates it
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.WinnowMd5(
      org.apache.spark.sql.catalyst.expressions.Literal("unused"), 8, 4)
    val docs = (0 until 64).map(i =>
      s"document number $i with a moderately long body of text to winnow " * 3)
    def fps(d: String): Seq[String] =
      expr.compute(UTF8String.fromString(d))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    val expected = docs.map(fps)
    for (_ <- 1 to 10) {
      val got = graft.util.Par.mapAll(docs)(fps)
      assert(got === expected, "concurrent compute corrupted a digest")
    }
  }

  test("native WinnowMd5 == builtin md5 pipeline, element for element") {
    // the q38 oracle path: same md5 of the same gram bytes, same
    // lowercase hex, same string-order window minima, same
    // first-occurrence distinct
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), TextOps.normalized(col("text")).as("__norm"))
      .localCheckpoint()
    val native = docs
      .select(col("doc_id"), graft.functions.WinnowMd5(col("__norm"), 8, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val generic = docs
      .select(col("doc_id"), TextOps.charGramHashes(col("__norm"), 8).as("__gh"))
      .select(col("doc_id"), TextOps.winnowSelect(col("__gh"), 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native.keySet === generic.keySet)
    native.foreach { case (id, fps) =>
      assert(fps === generic(id), s"doc $id md5 fingerprints diverge")
    }
    // boundary cases
    for (t <- Seq("", "1234567", "12345678", "12345678901", "aaaaaaaaaaaaaa")) {
      val n = Seq(t).toDF("t").select(graft.functions.WinnowMd5(col("t"), 8, 4).as("f"))
        .head().getSeq[String](0)
      val g = Seq(t).toDF("t")
        .select(TextOps.charGramHashes(col("t"), 8).as("gh"))
        .select(TextOps.winnowSelect(col("gh"), 4).as("f")).head().getSeq[String](0)
      assert(n === g, s"diverge on '$t'")
    }
    docs.unpersist(blocking = false)
  }

  test("native WinnowHash == generic xxhash64 composition, element for element") {
    // the one-pass expression must reproduce the builtin pipeline
    // exactly: same gram hashes (xxhash64 over gram bytes, seed 42),
    // same signed-long window minima, same first-occurrence distinct
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), TextOps.normalized(col("text")).as("__norm"))
      .localCheckpoint()
    val xx = TextOps.GramHasher.XxHash64
    val native = docs
      .select(col("doc_id"), graft.functions.WinnowHash(col("__norm"), 8, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val generic = docs
      .select(col("doc_id"), TextOps.charGramHashes(col("__norm"), 8, xx).as("__gh"))
      .select(col("doc_id"), TextOps.winnowSelect(col("__gh"), 4, xx).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet === generic.keySet)
    native.foreach { case (id, fps) =>
      assert(fps === generic(id), s"doc $id fingerprints diverge")
    }
    docs.unpersist(blocking = false)
  }

  test("native winnowing paths beat the builtin md5 pipeline on sf0.1 documents") {
    // normalization staged (checkpointed) OUTSIDE the timed region —
    // all paths share it, so the timing isolates gram hashing +
    // window-minimum selection. The builtin side stages its gram-hash
    // array through a select alias exactly as q38 used to.
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), TextOps.normalized(col("text")).as("__norm"))
      .localCheckpoint()
    def timeCount(df: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = df.count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // native paths FIRST, absorbing the codegen/JIT warm-up — the
    // builtin side gets the warm JVM, making asserted ratios conservative.
    // Under full-suite contention a single measurement can invert (other
    // suites burst on the shared 32 cores mid-count), so the ratio pin
    // takes the best of up to 3 interleaved passes: a genuine regression
    // fails all three, a co-tenant burst doesn't.
    var (nXx, nMd5, nGen) = (0L, 0L, 0L)
    var (bestXxRatio, bestMd5Ratio) = (0.0, 0.0)
    var pass = 0
    while (pass < 3 && (bestXxRatio < 2.0 || bestMd5Ratio < 1.3)) {
      pass += 1
      val (nx, tXx) = timeCount(docs
        .select(explode(graft.functions.WinnowHash(col("__norm"), 8, 4)).as("fp")))
      val (nm, tMd5) = timeCount(docs
        .select(explode(graft.functions.WinnowMd5(col("__norm"), 8, 4)).as("fp")))
      val (ng, tGen) = timeCount(docs
        .select(TextOps.charGramHashes(col("__norm"), 8).as("__gh"))
        .select(explode(TextOps.winnowSelect(col("__gh"), 4)).as("fp")))
      nXx = nx; nMd5 = nm; nGen = ng
      bestXxRatio = math.max(bestXxRatio, tGen / tXx)
      bestMd5Ratio = math.max(bestMd5Ratio, tGen / tMd5)
      info(f"pass $pass: xx ${tXx}%.2fs, native md5 ${tMd5}%.2fs, builtin md5 ${tGen}%.2fs " +
        f"-> xx ${tGen / tXx}%.1fx, md5 ${tGen / tMd5}%.1fx")
    }
    // winnowing density ~2/(w+1) is hash-independent: per-path totals
    // agree closely even though xx selects different positions; the
    // md5 paths are value-identical so their counts are EQUAL
    assert(nMd5 === nGen)
    assert(nXx > 0 && math.abs(nXx - nGen).toDouble / nGen < 0.1,
      s"fingerprint density diverged: xx=$nXx builtin=$nGen")
    // floors leave room for load noise below the measured ratios
    assert(bestXxRatio >= 2.0,
      f"xxhash64 path only ${bestXxRatio}%.2fx faster across $pass passes")
    assert(bestMd5Ratio >= 1.3,
      f"native md5 path only ${bestMd5Ratio}%.2fx faster across $pass passes")
    docs.unpersist(blocking = false)
  }
}
