package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native ArgmaxDot expression must reproduce the builtin
  * assignment fold exactly — it decides which cluster every training
  * row updates, so value drift would change the trained quantizer.
  */
class KmeansNativeSpec extends SparkSpec {
  import spark.implicits._

  private val cands: Seq[Seq[Double]] = {
    val rng = new scala.util.Random(5)
    Seq.fill(7)(Seq.fill(64)(rng.nextGaussian()))
  }

  test("native ArgmaxDot == builtin fold on sf0.01 embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    val native = emb.select(col("vec_id"), graft.functions.ArgmaxDot(col("v"), cands).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val generic = emb.select(col("vec_id"), Similarity.argmaxDotGeneric(col("v"), cands).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native === generic)
    assert(native.values.toSet.size > 1, "degenerate fixture: all rows in one cluster")
    emb.unpersist(blocking = false)
  }

  test("edge semantics: tie keeps first max; mismatch/null element -> -1") {
    val tieCands = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(
      (1L, Some(Seq(Option(2.0), Option(0.0)))), // ties cands 0/1 -> 0
      (2L, Some(Seq(Option(0.0), Option(3.0)))), // cand 2
      (3L, Some(Seq(Option(1.0)))),              // length mismatch -> -1
      (4L, Some(Seq(Option(1.0), None)))         // null element -> -1
    ).toDF("id", "v")
    val native = df.select(col("id"), graft.functions.ArgmaxDot(col("v"), tieCands).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val generic = df.select(col("id"), Similarity.argmaxDotGeneric(col("v"), tieCands).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native === generic)
    assert(native === Map(1L -> 0, 2L -> 2, 3L -> -1, 4L -> -1))
  }

  test("trained quantizer unchanged by the native assignment (recall floor holds)") {
    // same seeds, same fixture as SimilaritySpec's trained-IVF test:
    // the centroids (and therefore recall) must be as good as before
    val rng = new scala.util.Random(11)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian() * 5))
    val rows = for { c <- 0 until 4; i <- 0 until 25 } yield {
      val v = centers(c).map(x => (x + rng.nextGaussian() * 0.3).toFloat)
      ((c * 25 + i).toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding").cache()
    val queries = df.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(df, queries, k = 5).cache()
    val trained = Similarity.ivfTopK(df, queries, k = 5,
      numCentroids = 4, nProbe = 1, kmeansIters = 5)
    val r = Similarity.recallAtK(exact, trained)
    assert(r >= 0.9, s"trained-IVF recall@5 at nProbe=1 = $r")
    exact.unpersist(); df.unpersist()
  }

  test("kmeansCentroids skips malformed vectors instead of crashing") {
    // ArgmaxDot codes wrong-length / null-element vectors as -1; the
    // trainer must drop them (the Pq.encode contract), not index
    // acc(-1) on the driver
    val rng = new scala.util.Random(3)
    val good = (1 to 40).map(i => (i.toLong, Seq.fill(8)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    val shortRow = Seq((998L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val nullElem = Seq((999L, Seq.fill(8)(1.0))).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 3, lit(null).cast("double")).otherwise(x))
          .as("embedding"))
    val df = good.unionByName(shortRow).unionByName(nullElem)
    val cents = Similarity.kmeansCentroids(df, k = 2, iters = 2)
    assert(cents.length === 2)
    assert(cents.forall(_.length === 8), "centroids keep the good-vector dim")
    assert(cents.forall(_.forall(x => !x.isNaN)))
  }
}
