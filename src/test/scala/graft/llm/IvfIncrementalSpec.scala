package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the incremental-IVF contract: (1) assignment is the exact
  * argmax a brute-force check produces (rounded cosine, smallest-cid
  * ties); (2) appending a batch NEVER re-reads the indexed base corpus
  * — the assignment plan scans only the persisted centroid parquet and
  * the batch (the property that makes daily appends O(batch), not
  * O(corpus)); (3) the drift audit is exactly the decimal-mean
  * arithmetic on never/partially-chosen centroids.
  */
class IvfIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("assignment matches brute-force argmax with smallest-cid ties") {
    val cents = Seq(
      (0L, vec(1, 0, 0)), (1L, vec(0, 1, 0)), (2L, vec(1, 0, 0))
    ).toDF("centroid_id", "cvec")
    val batch = Seq(
      (10L, vec(2, 0, 0)),   // ties centroids 0 and 2 -> smallest cid 0
      (11L, vec(0, 3, 0.1)), // nearest 1
      (12L, vec(1, 1, 0))    // exact tie 0/1/2 on cosine? 0.7071 for all of 0,1,2 -> cid 0
    ).toDF("vec_id", "embedding")
    val got = IvfIncremental.assignBatch(batch, cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(10L)._1 == 0L && got(10L)._2 == 1.0)
    assert(got(11L)._1 == 1L)
    assert(got(12L)._1 == 0L)
  }

  test("appending a batch never re-reads the base corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf-inc-").toString
    val base = (0L until 64L).map(i =>
      (i, vec(math.sin(i * 1.7), math.cos(i * 0.3), math.sin(i * 0.9 + 1))))
      .toDF("vec_id", "embedding")
    base.write.parquet(s"$tmp/base_corpus")
    val baseOnDisk = spark.read.parquet(s"$tmp/base_corpus")
    // index build (the one-time cost that IS allowed to read the base)
    baseOnDisk.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
      .write.parquet(s"$tmp/centroids")
    val centroids = spark.read.parquet(s"$tmp/centroids")
    IvfIncremental.trainStats(IvfIncremental.assignBatch(baseOnDisk, centroids))
      .write.parquet(s"$tmp/stats")
    // append path: batch + persisted index ONLY
    val batch = (100L until 120L).map(i =>
      (i, vec(math.cos(i * 0.7), math.sin(i * 1.1), math.cos(i * 0.2))))
      .toDF("vec_id", "embedding")
    val asgn = IvfIncremental.assignBatch(batch, centroids)
    val audit = IvfIncremental.driftAudit(asgn, spark.read.parquet(s"$tmp/stats"))
    for ((name, df) <- Seq("assign" -> asgn, "audit" -> audit)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("base_corpus"),
        s"$name plan re-reads the base corpus:\n$plan")
    }
    assert(asgn.count() == 20 && audit.count() == 4)
  }

  test("drift audit arithmetic incl. a never-chosen centroid") {
    val cents = Seq((0L, vec(1, 0)), (1L, vec(0, 1))).toDF("centroid_id", "cvec")
    val train = Seq((1L, vec(1, 0)), (2L, vec(1, 0.1)), (3L, vec(0.1, 1)))
      .toDF("vec_id", "embedding")
    val stats = IvfIncremental.trainStats(IvfIncremental.assignBatch(train, cents))
    // batch chooses ONLY centroid 0
    val batch = Seq((10L, vec(1, 0)), (11L, vec(1, 0.2))).toDF("vec_id", "embedding")
    val audit = IvfIncremental
      .driftAudit(IvfIncremental.assignBatch(batch, cents), stats)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    val (nTrain0, nNew0, meanTrain0, meanNew0) = audit(0L)
    assert(nTrain0 == 2 && nNew0 == 2)
    val sim11 = 1.0 / math.sqrt(1 + 0.04) // cos((1,0.2),(1,0)) before rounding
    assert(meanNew0.isDefined &&
      math.abs(meanNew0.get - (1.0 + BigDecimal(sim11).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble) / 2) < 1e-9)
    assert(meanTrain0 > 0.9, s"train mean wrong: $meanTrain0")
    val (nTrain1, nNew1, _, meanNew1) = audit(1L)
    assert(nTrain1 == 1 && nNew1 == 0 && meanNew1.isEmpty,
      "never-chosen centroid must keep NULL batch stats")
  }

  test("drift audit keeps a centroid ABSENT from train stats (advice fix)") {
    // round-15 advice fix: a left join onto stats silently dropped the
    // batch assignments of a zero-train-member centroid — losing the
    // re-train signal exactly where drift is largest
    val cents = Seq((0L, vec(1, 0)), (1L, vec(0, 1))).toDF("centroid_id", "cvec")
    val train = Seq((1L, vec(1, 0))).toDF("vec_id", "embedding") // only cid 0
    val stats = IvfIncremental.trainStats(IvfIncremental.assignBatch(train, cents))
    val batch = Seq((10L, vec(0, 1))).toDF("vec_id", "embedding") // chooses cid 1
    val audit = IvfIncremental
      .driftAudit(IvfIncremental.assignBatch(batch, cents), stats)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(audit.contains(1L), "batch-only centroid dropped from the audit")
    val (nTrain, nNew, meanTrain, meanNew) = audit(1L)
    assert(nTrain == 0 && nNew == 1)
    assert(meanTrain.isEmpty, "mean_sim_train must be NULL when n_train = 0")
    assert(meanNew.contains(1.0))
  }
}
