package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the incremental-PQ contract (the q142/q143 story per
  * subspace): (1) per-subspace encoding is the exact rounded-cosine
  * argmax with smallest-code ties a brute-force check produces;
  * (2) appending a batch NEVER re-reads the indexed base corpus — the
  * encode/audit plans scan only the persisted codebook/stats parquets
  * and the batch; (3) the drift audit is exactly the decimal-mean
  * arithmetic, and a subspace ABSENT from the train stats survives the
  * full outer join with n_train = 0 and a NULL train mean.
  */
class PqIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val cbs = Seq(
    (0L, 0L, Seq(1.0, 0.0)), (0L, 1L, Seq(0.0, 1.0)),
    (1L, 0L, Seq(1.0, 0.0)), (1L, 1L, Seq(1.0, 1.0)))

  test("per-subspace encoding matches brute force with smallest-code ties") {
    val cb = cbs.toDF("subspace", "code", "cvec")
    val batch = Seq(
      (10L, vec(2, 0, 0, 3)),
      (11L, vec(1, 1, 1, 0))) // subspace 0 TIES codes 0/1 at round-9
      .toDF("vec_id", "embedding")
    val got = PqIncremental.encodeBatch(batch, cb, dim = 4, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got((10L, 0L)) == ((0L, 1.0, 0.0)))
    assert(got((10L, 1L))._1 == 1L, "nearest codeword in subspace 1")
    assert(got((10L, 1L))._2 == r9(3.0 / (3.0 * math.sqrt(2))))
    assert(got((11L, 0L))._1 == 0L,
      "round-9 cosine tie must break to the SMALLEST code")
    assert(got((11L, 1L)) == ((0L, 1.0, 0.0)))
    // qerr = round9(1 - cos_sim), on the already-rounded cos
    for (((_, _), (_, c, q)) <- got) assert(q == r9(1.0 - c))
  }

  test("appending a batch never re-reads the base corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("pq-inc-").toString
    val base = (0L until 64L).map(i => (i, vec(
      math.sin(i * 1.7), math.cos(i * 0.3), math.sin(i * 0.9 + 1),
      math.cos(i * 1.1)))).toDF("vec_id", "embedding")
    base.write.parquet(s"$tmp/base_corpus")
    val baseOnDisk = spark.read.parquet(s"$tmp/base_corpus")
    // index build (the one-time cost that IS allowed to read the base)
    PqIncremental.pinnedCodebooks(baseOnDisk, dim = 4, m = 2, kCent = 4)
      .write.parquet(s"$tmp/codebooks")
    val cb = spark.read.parquet(s"$tmp/codebooks")
    PqIncremental.trainStats(
      PqIncremental.encodeBatch(baseOnDisk, cb, dim = 4, m = 2))
      .write.parquet(s"$tmp/stats")
    // append path: batch + persisted index ONLY
    val batch = (100L until 120L).map(i => (i, vec(
      math.cos(i * 0.7), math.sin(i * 1.1), math.cos(i * 0.2),
      math.sin(i * 0.5)))).toDF("vec_id", "embedding")
    val enc = PqIncremental.encodeBatch(batch, cb, dim = 4, m = 2)
    val audit = PqIncremental.driftAudit(enc, spark.read.parquet(s"$tmp/stats"))
    for ((name, df) <- Seq("encode" -> enc, "audit" -> audit)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("base_corpus"),
        s"$name plan re-reads the base corpus:\n$plan")
    }
    assert(enc.count() == 40 && audit.count() == 2)
  }

  test("drift audit: decimal means; absent-from-stats subspace survives") {
    val cb = cbs.toDF("subspace", "code", "cvec")
    val train = Seq((1L, vec(1, 0, 1, 0)), (2L, vec(2, 1, 0, 1)))
      .toDF("vec_id", "embedding")
    val full = PqIncremental.encodeBatch(train, cb, dim = 4, m = 2)
    // stats cover ONLY subspace 0 — as if subspace 1 had no members
    val stats = PqIncremental.trainStats(full.filter(col("subspace") === 0))
    val batch = Seq((10L, vec(0, 1, 1, 1))).toDF("vec_id", "embedding")
    val enc = PqIncremental.encodeBatch(batch, cb, dim = 4, m = 2)
    val audit = PqIncremental.driftAudit(enc, stats)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    val (nt0, nn0, mt0, mn0, d0) = audit(0L)
    assert(nt0 == 2 && nn0 == 1)
    // train qerrs in subspace 0: vec 1 -> (1,0) exact (qerr 0); vec 2 ->
    // (2,1): cos vs (1,0) = 2/sqrt(5) ~ .894, vs (0,1) = 1/sqrt(5),
    // vs... codes {0,1}: best (1,0) -> qerr r9(1 - r9(2/sqrt(5)))
    val q2 = r9(1.0 - r9(2.0 / math.sqrt(5)))
    assert(mt0.contains(r9((BigDecimal(0.0) + BigDecimal(q2)).toDouble / 2)))
    // batch subspace 0: (0,1) -> code 1 exact, qerr 0
    assert(mn0.contains(0.0) && d0.contains(r9(0.0 - mt0.get)))
    val (nt1, nn1, mt1, mn1, d1) = audit(1L)
    assert(nt1 == 0 && nn1 == 1, "absent-from-stats subspace must survive")
    assert(mt1.isEmpty && d1.isEmpty, "NULL train mean and drift when n_train = 0")
    assert(mn1.isDefined)
  }
}
