package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Similarity.semanticPairs/semanticDupGroups): the k=1
  * degeneracy is bit-equal to exact all-pairs (q60's oracle contract),
  * the production path (k>1) returns a subset of the exact pairs with
  * high planted-twin recall, runs deterministically under a fixed
  * seed, and the groups form is consistent with its pairs.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // the q34/q60 corpus recipe: sf0.001 embeddings + perturbed twins
  // (planted near-dups at cosine ≈ 0.997)
  private lazy val corpus: DataFrame = {
    val emb = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twins = emb
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + lit(0.005) *
            (pmod(col("vec_id") + i.cast("bigint") + 1, lit(7)) - 3).cast("double"))
          .as("embedding"))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    base.unionByName(twins).localCheckpoint()
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSet

  private lazy val exact: Set[(Long, Long)] = {
    val l = corpus.select(col("vec_id").as("id_a"), col("embedding").as("__va"))
    val r = corpus.select(col("vec_id").as("id_b"), col("embedding").as("__vb"))
    pairSet(l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .filter(round(Similarity.cosine(col("__va"), col("__vb")), 9) >= 0.8))
  }

  test("k=1 (one cell) equals the exact all-pairs set") {
    val got = pairSet(Similarity.semanticPairs(corpus, tau = 0.8, k = 1,
      iters = 0))
    assert(got === exact)
    assert(exact.nonEmpty) // the planted twins guarantee pairs exist
  }

  test("k=4 production path: subset of exact, twin recall >= 0.9, deterministic") {
    def run() = pairSet(Similarity.semanticPairs(corpus, tau = 0.8, k = 4,
      iters = 2))
    val got = run()
    assert(got.subsetOf(exact), "cell-bounded pairs can never exceed the exact set")
    // planted twins (v, v+1M) are near-identical vectors: a learned
    // cell boundary between them means the base vector sits ON the
    // boundary — rare, so recall on the planted set must stay high
    val planted = exact.filter { case (a, b) => b == a + 1000000L }
    val caught = planted.count(got.contains)
    assert(planted.nonEmpty)
    assert(caught.toDouble / planted.size >= 0.9,
      s"twin recall ${caught.toDouble / planted.size}")
    assert(run() === got, "same seed must reproduce the same pair set")
  }

  test("semDedupClustered equals the brute-force keep-first rule on pinned centroids") {
    val tau = 0.99
    val cents = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
      .filter(col("vec_id") < 16)
    val got = Similarity.semDedupClustered(corpus, cents, tau,
        centroidIdCol = "vec_id")
      .select(col("vec_id").cast("long"), col("cluster_id").cast("long"),
        col("keep"))
      .as[(Long, Long, Boolean)].collect()
    // brute-force reference: rounded-cosine smallest-cid assignment,
    // then drop iff a smaller-id cluster-mate is >= tau
    val vecs = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    val cvs = cents
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0
      else BigDecimal(d / (na * nb))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val wantCluster = vecs.map { case (id, v) =>
      id -> cvs.map { case (cid, cv) => (cos(v, cv), -cid) }.zip(cvs.map(_._1))
        .maxBy(_._1)._2
    }
    val byCluster = wantCluster.groupBy(_._2).map { case (c, m) =>
      c -> m.keys.toSeq.sorted }
    val wantKeep = vecs.keys.map { id =>
      val mates = byCluster(wantCluster(id)).filter(_ < id)
      id -> !mates.exists(m => cos(vecs(id), vecs(m)) >= tau)
    }.toMap
    assert(got.length == vecs.size)
    got.foreach { case (id, c, k) =>
      assert(c == wantCluster(id), s"cluster of $id")
      assert(k == wantKeep(id), s"keep of $id")
    }
    // the planted twins must actually exercise the drop path
    assert(got.count(!_._3) > 0, "fixture must drop at least one twin")
    // per-cluster pairing only: the pair scan joins on the cluster key
    val plan = Similarity.semDedupClustered(corpus, cents, tau,
      centroidIdCol = "vec_id").queryExecution.optimizedPlan.toString
    assert(plan.contains("__c"), "within-cluster pair join key missing")
  }

  test("semDedupAppend equals the full recompute restricted to the batch; corpus decisions frozen") {
    val tau = 0.99
    val cents = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
      .filter(col("vec_id") < 16)
    // batch: fresh ids above the corpus — light re-perturbations of
    // every 4th base (near-dups: must drop vs the corpus) + reversed
    // vectors (novel geometry: pass)
    val base = graft.Tables(spark, "/root/testdata/sf0.001").embeddings
    val batch = base
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => x + lit(0.002) *
            (pmod(col("vec_id") + i.cast("bigint"), lit(3)) - 1).cast("double"))
          .as("embedding"))
      .filter(pmod(col("vec_id"), lit(4)) === 0)
      .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding"))
      .unionByName(base.filter(pmod(col("vec_id"), lit(4)) === 1)
        .select((col("vec_id") + 6000000L).as("vec_id"),
          reverse(col("embedding").cast("array<double>")).as("embedding")))
    val corpusAsg = Similarity.semDedupClustered(corpus, cents, tau,
      centroidIdCol = "vec_id").select("vec_id", "cluster_id")
    val got = Similarity.semDedupAppend(batch, corpusAsg, corpus, cents,
        tau, centroidIdCol = "vec_id")
      .as[(Long, Long, Boolean)].collect().toSet
    val want = Similarity.semDedupClustered(corpus.unionByName(batch),
        cents, tau, centroidIdCol = "vec_id")
      .filter(col("vec_id") >= 5000000L)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === want)
    assert(got.exists(!_._3) && got.exists(_._3),
      "fixture must exercise both the drop and the pass path")
    // corpus decisions are untouched by the append: the full recompute
    // over corpus ∪ batch reproduces them bit for bit (the equivalence
    // proof's premise — keep(x) references smaller ids only)
    val beforeC = Similarity.semDedupClustered(corpus, cents, tau,
      centroidIdCol = "vec_id").as[(Long, Long, Boolean)].collect().toSet
    val afterC = Similarity.semDedupClustered(corpus.unionByName(batch),
        cents, tau, centroidIdCol = "vec_id")
      .filter(col("vec_id") < 5000000L)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(beforeC === afterC)
  }

  test("groups keep each component's min id and cover exactly the paired ids") {
    val pairs = pairSet(Similarity.semanticPairs(corpus, tau = 0.8, k = 1,
      iters = 0))
    val groups = Similarity.semanticDupGroups(corpus, tau = 0.8, k = 1,
      iters = 0)
      .as[(Long, Long)].collect().toMap
    val pairedIds = pairs.flatMap(p => Seq(p._1, p._2))
    assert(groups.keySet === pairedIds)
    groups.foreach { case (id, keep) => assert(keep <= id) }
    // every pair's two ids share a component label
    pairs.foreach { case (a, b) => assert(groups(a) === groups(b)) }
  }
}
