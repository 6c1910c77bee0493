package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sparse-HLL sketch: exact below tau (the q96 oracle regime), merge ≡
  * direct on both sides of the sparse→dense transition, dense-mode
  * error within the HLL bound, storage round-trip.
  */
class HllSparseSpec extends SparkSpec {
  import spark.implicits._

  test("sparse regime: estimate is EXACT distinct count; merge == direct") {
    // 600 distinct values across 3 'days' with heavy overlap
    val rows = (0 until 2000).map(i => (i % 3, (i % 600).toLong)).toDF("day", "v")
    val direct = rows.agg(
      HllSparseEstimate(HllSparseAgg(col("v"))).as("e")).as[Long].head()
    assert(direct === 600L)
    val merged = rows.groupBy("day").agg(HllSparseAgg(col("v")).as("sk"))
      .agg(HllSparseEstimate(HllSparseMergeAgg(col("sk"))).as("e"))
      .as[Long].head()
    assert(merged === 600L, "merge of sparse day sketches must stay exact")
  }

  test("sparse->dense transition: crossing tau flips mode, estimate stays sane") {
    val buf = new HllSparse.Buf(tau = 100, p = 12)
    (0 until 100).foreach(i => buf.addValue(i.toLong))
    assert(buf.set != null && buf.estimate === 100L, "at tau: still sparse-exact")
    buf.addValue(100L)
    assert(buf.set == null, "past tau: dense registers")
    val e = buf.estimate.toDouble
    assert(math.abs(e - 101.0) / 101.0 < 0.10, s"post-transition estimate $e")
  }

  test("merge across modes: sparse into dense == all-direct, order-independent") {
    def bufOf(r: Range, tau: Int = 100): HllSparse.Buf = {
      val b = new HllSparse.Buf(tau, 12)
      r.foreach(i => b.addValue(i.toLong))
      b
    }
    val direct = bufOf(0 until 5000)
    val a = bufOf(0 until 3000) // dense
    val b = bufOf(2500 until 5000) // dense
    val c = bufOf(4990 until 5000) // sparse
    a.mergeIn(b); a.mergeIn(c)
    assert(a.estimate === direct.estimate, "merged estimate must equal direct")
    val a2 = bufOf(4990 until 5000)
    val b2 = bufOf(2500 until 5000)
    a2.mergeIn(b2); a2.mergeIn(bufOf(0 until 3000))
    assert(a2.estimate === direct.estimate, "merge order must not matter")
  }

  test("dense accuracy: within ~3 sigma of the 1.04/sqrt(m) HLL bound at 100k") {
    val n = 100000
    val est = spark.range(n).agg(
      HllSparseEstimate(HllSparseAgg(col("id"), 4096, 12)).as("e"))
      .as[Long].head()
    val rse = 1.04 / math.sqrt(1 << 12)
    assert(math.abs(est - n).toDouble / n < 3 * rse,
      s"dense estimate $est vs $n (bound ${3 * rse})")
  }

  test("serialization round-trips both modes; incompatible params fail loudly") {
    val sp = new HllSparse.Buf(tau = 100, p = 12)
    (0 until 50).foreach(i => sp.addValue(i.toLong))
    val sp2 = HllSparse.deserialize(sp.serialize)
    assert(sp2.set != null && sp2.estimate === 50L)
    val dn = new HllSparse.Buf(tau = 10, p = 12)
    (0 until 500).foreach(i => dn.addValue(i.toLong))
    val dn2 = HllSparse.deserialize(dn.serialize)
    assert(dn2.set == null && dn2.estimate === dn.estimate)
    val other = new HllSparse.Buf(tau = 100, p = 11)
    intercept[IllegalArgumentException](sp2.mergeIn(other))
  }

  test("q96 shape on catalog rows: sparse-exact equals COUNT(DISTINCT)") {
    val t = graft.Tables(spark, "/root/testdata/sf0.001")
    val got = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(HllSparseAgg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(HllSparseEstimate(HllSparseMergeAgg(col("sk"))).as("e"))
      .orderBy("event_type")
      .as[(String, Long)].collect()
    val want = t.events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("e"))
      .orderBy("event_type")
      .as[(String, Long)].collect()
    assert(got.toSeq === want.toSeq)
  }
}
