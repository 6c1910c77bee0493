package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: schema, batched decode, metadata
  * typing, frame sampling — all over the deterministic fake decoder
  * (real codecs are stubbed by design; the Spark-side contract is what
  * is under test).
  */
class MultimodalSpec extends SparkSpec {

  test("synthetic fixture matches the canonical schema") {
    val df = Multimodal.syntheticFixture(spark, 12)
    assert(df.schema === Multimodal.schema)
    assert(df.count() === 12)
    assert(df.select("modality").distinct().count() === 3)
  }

  test("decodeFeatures: batched per-partition decode, dims recovered from payload") {
    val df = Multimodal.syntheticFixture(spark, 12)
    val dec = Multimodal.decodeFeatures(df, new Multimodal.FakeDecoder(featureDim = 8))
    assert(dec.schema === Multimodal.decodedSchema)
    val rows = dec.collect()
    assert(rows.length === 12)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = r.getInt(2); val h = r.getInt(3)
      // FakeDecoder reads dims out of the first 4 payload bytes, which
      // syntheticFixture wrote from the same (i % 8, i % 5) formula
      assert(w === 64 + (id % 8) * 16, s"row $id width")
      assert(h === 48 + (id % 5) * 16, s"row $id height")
      assert(r.getAs[Seq[Float]](5).length === 8)
    }
    // video rows report payload-derived frame counts; others 1
    rows.foreach { r =>
      if (r.getString(1) == "video") assert(r.getInt(4) > 1) else assert(r.getInt(4) === 1)
    }
  }

  test("decode is deterministic (same payload -> same feature)") {
    val df = Multimodal.syntheticFixture(spark, 6)
    val d1 = Multimodal.decodeFeatures(df, new Multimodal.FakeDecoder())
      .select("id", "feature").collect().map(r => r.getLong(0) -> r.getAs[Seq[Float]](1)).toMap
    val d2 = Multimodal.decodeFeatures(df, new Multimodal.FakeDecoder())
      .select("id", "feature").collect().map(r => r.getLong(0) -> r.getAs[Seq[Float]](1)).toMap
    assert(d1 === d2)
  }

  test("typedMeta: stringly map -> typed columns") {
    val df = Multimodal.syntheticFixture(spark, 6)
    val m = Multimodal.typedMeta(df)
    val r = m.filter(col("id") === 0L).collect()(0)
    assert(r.getAs[Int]("meta_width") === 64)
    assert(r.getAs[Int]("meta_height") === 48)
    assert(r.getAs[String]("codec") === "fake-image")
    assert(r.getAs[Int]("payload_bytes") > 4)
  }

  test("distributed fixture: deterministic under partitioning, planted dups exact") {
    val a = Multimodal.syntheticFixtureDistributed(spark, 40)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](2).toSeq).toMap
    val b = Multimodal.syntheticFixtureDistributed(spark, 40).repartition(7)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](2).toSeq).toMap
    assert(a === b, "fixture payloads changed across builds/partitioning")
    // every 10th row duplicates the payload 9 rows before it
    (0 until 40).foreach { i =>
      if (i % 10 == 9) assert(a(i.toLong) === a((i - 9).toLong), s"row $i not a dup of ${i - 9}")
      else if (i % 10 != 9) assert(!a.exists { case (j, p) => j != i && j % 10 != 9 && p == a(i.toLong) },
        s"unexpected dup of row $i")
    }
  }

  test("q32 pipeline shape: feature-key dedup groups = planted payload dups") {
    val fix = Multimodal.syntheticFixtureDistributed(spark, 40)
    val decoded = Multimodal.decodeFeatures(
      Multimodal.frameSample(fix, stride = 2), new Multimodal.FakeDecoder(8))
    val groups = decoded
      .select(col("id"), md5(concat_ws(",", col("feature").cast("array<string>"))).as("fk"))
      .groupBy("fk").agg(count(lit(1)).as("n"), min("id").as("keep"))
      .collect()
    // 40 rows, 4 planted dup pairs (9->0, 19->10, 29->20, 39->30)
    assert(groups.map(_.getAs[Long]("n")).sum === 40L)
    val dupGroups = groups.filter(_.getAs[Long]("n") > 1L)
    assert(dupGroups.length === 4, s"expected 4 dup groups, got ${dupGroups.length}")
    assert(dupGroups.map(_.getAs[Long]("keep")).sorted.toSeq === Seq(0L, 10L, 20L, 30L))
  }

  test("frameSample: keeps every stride-th 16-byte frame of video payloads") {
    val df = Multimodal.syntheticFixture(spark, 12)
    val before = df.select(col("id"), col("modality"), length(col("data")).as("len"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val after = Multimodal.frameSample(df, stride = 2)
      .select(col("id"), length(col("data")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    before.foreach { case (id, (mod, len)) =>
      if (mod == "video") {
        val frames = len / 16
        val kept = (frames + 1) / 2 // ceil(frames / 2)
        assert(after(id) === kept * 16, s"video $id: $len -> ${after(id)}")
      } else assert(after(id) === len, s"non-video $id must pass through")
    }
  }
}
