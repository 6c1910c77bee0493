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

  // --- RealDecoder: the JDK's own codecs, real bytes in ---

  /** Deterministic w×h RGB image: 4×4 pixel blocks in seeded random
    * colors (distinct seeds → distinct rasters with overwhelming
    * probability), encoded with the given ImageIO format.
    */
  private def encodedImage(w: Int, h: Int, seed: Long, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rng = new scala.util.Random(seed)
    val colors = Array.fill((w / 4 + 1) * (h / 4 + 1))(rng.nextInt(0xffffff))
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, colors((y / 4) * (w / 4 + 1) + (x / 4)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** Half-black / half-white w×h image with analytically known block
    * means: left-half cells decode to 0.0, right-half cells to 1.0.
    */
  private def halfWhite(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  test("RealDecoder: PNG decode — exact dims and block-mean luminance feature") {
    val dec = new Multimodal.RealDecoder(grid = 8)
    val (w, h, frames, feat) = dec.decode("image", halfWhite(32, 16, "png"))
    assert((w, h, frames) === (32, 16, 1))
    assert(feat.length === 64)
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val expected = if (cx < 4) 0.0f else 1.0f
      assert(math.abs(feat(cy * 8 + cx) - expected) < 1e-6,
        s"cell ($cx,$cy): ${feat(cy * 8 + cx)} != $expected")
    }
  }

  test("RealDecoder: JPEG decode — exact dims, feature within codec loss of PNG's") {
    val dec = new Multimodal.RealDecoder(grid = 8)
    val (w, h, _, feat) = dec.decode("image", halfWhite(32, 16, "jpg"))
    assert((w, h) === (32, 16))
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val expected = if (cx < 4) 0.0f else 1.0f
      assert(math.abs(feat(cy * 8 + cx) - expected) < 0.06,
        s"cell ($cx,$cy): ${feat(cy * 8 + cx)} vs $expected beyond JPEG loss")
    }
  }

  test("RealDecoder: image decode is deterministic and handles sub-grid images") {
    val dec = new Multimodal.RealDecoder(grid = 8)
    val payload = encodedImage(40, 24, seed = 7, "png")
    val a = dec.decode("image", payload)
    val b = dec.decode("image", payload)
    assert(a._4.toSeq === b._4.toSeq)
    // 3×2 image (smaller than the 8×8 grid): every cell still covers
    // ≥ 1 pixel, no crash, dims exact
    val tiny = dec.decode("image", encodedImage(3, 2, seed = 1, "png"))
    assert((tiny._1, tiny._2) === (3, 2))
    assert(tiny._4.length === 64 && tiny._4.forall(v => v >= 0f && v <= 1f))
  }

  test("RealDecoder: WAV PCM decode — rate/channels/frames + amplitude envelope") {
    // 8 kHz mono 16-bit PCM, constant amplitude 0.5 for the first half
    // of the clip then silence: bins 0..31 ≈ 0.5, bins 32..63 ≈ 0
    val n = 8000
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n / 2) {
      val v = 16384 // 0.5 in 16-bit
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val (rate, ch, frames, feat) = new Multimodal.RealDecoder(grid = 8)
      .decode("audio", out.toByteArray)
    assert((rate, ch, frames) === (8000, 1, 8000))
    assert(feat.length === 64)
    (0 until 32).foreach(b => assert(math.abs(feat(b) - 0.5f) < 1e-3, s"bin $b: ${feat(b)}"))
    (32 until 64).foreach(b => assert(feat(b) === 0.0f, s"bin $b: ${feat(b)}"))
  }

  test("RealDecoder: non-GVID video and compressed audio fail loudly with truthful context") {
    val dec = new Multimodal.RealDecoder()
    val e1 = intercept[UnsupportedOperationException](dec.decode("video", Array[Byte](1, 2, 3)))
    assert(e1.getMessage.contains("no general video codec"))
    val e2 = intercept[UnsupportedOperationException](dec.decode("audio", Array[Byte](1, 2, 3)))
    assert(e2.getMessage.contains("not a PCM container"))
  }

  test("RealDecoder: GVID motion-PNG decodes per frame through javax.imageio; mean raster exact") {
    val dec = new Multimodal.RealDecoder(8)
    val payload = Multimodal.gvidBytes(base = 7L, seed = 42L, perturb = false)
    val (w, h, frames, feat) = dec.decode("video", payload)
    assert(w === 64 && h === 48 && frames === 4 && feat.length === 64)
    // by-hand mean of the four per-frame rasters (same decoder path)
    val perFrame = (0 until 4).map { f =>
      dec.decode("image", Multimodal.pngBytes(7L * 16 + f, 42L, perturb = false))._4
    }
    feat.indices.foreach { i =>
      val want = (perFrame.map(_(i).toDouble).sum / 4).toFloat
      assert(feat(i) === want, s"cell $i")
    }
    // byte-exact container copy decodes to the identical raster
    val copy = dec.decode("video",
      Multimodal.gvidBytes(base = 7L, seed = 42L, perturb = false))._4
    assert(copy.toSeq === feat.toSeq)
  }

  test("q32 pipeline with RealDecoder: image-only fixture, perceptual feature-key dedup") {
    // the q32 dup recipe (row i copies row i-9 when i % 10 == 9) over
    // REAL PNG payloads: the dedup key is the decoded block-luminance
    // raster, i.e. an actual perceptual fingerprint of the pixels
    val rows = (0 until 40).map { i =>
      val src = if (i % 10 == 9) i - 9 else i
      org.apache.spark.sql.Row(i.toLong, "image", encodedImage(32, 24, seed = 100L + src, "png"),
        Map("width" -> "32", "height" -> "24", "codec" -> "png"))
    }
    val fix = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Multimodal.schema)
    val decoded = Multimodal.decodeFeatures(
      Multimodal.frameSample(fix, stride = 2), new Multimodal.RealDecoder(8))
    val groups = decoded
      .select(col("id"), md5(concat_ws(",", col("feature").cast("array<string>"))).as("fk"))
      .groupBy("fk").agg(count(lit(1)).as("n"), min("id").as("keep"))
      .collect()
    assert(groups.map(_.getAs[Long]("n")).sum === 40L)
    val dupGroups = groups.filter(_.getAs[Long]("n") > 1L)
    assert(dupGroups.length === 4, s"expected 4 dup groups, got ${dupGroups.length}")
    assert(dupGroups.map(_.getAs[Long]("keep")).sorted.toSeq === Seq(0L, 10L, 20L, 30L))
    // decoded dims come from the real payload, not metadata
    assert(decoded.select("width", "height").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq === Seq((32, 24)))
  }

  test("ingestBinaryDir: real PNG files enter through the binaryFile source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toFile
    try {
      for (i <- 0 until 3)
        java.nio.file.Files.write(new java.io.File(dir, s"img$i.png").toPath,
          encodedImage(16 + i * 8, 12, seed = i.toLong, "png"))
      java.nio.file.Files.write(new java.io.File(dir, "decoy.txt").toPath,
        "not an image".getBytes)
      val df = Multimodal.ingestBinaryDir(spark, dir.getAbsolutePath,
        "image", glob = "*.png")
      // glob pruned the decoy; schema is the canonical contract
      assert(df.count() === 3)
      assert(df.schema.map(f => (f.name, f.dataType)) ===
        Multimodal.schema.map(f => (f.name, f.dataType)))
      // ids are path-derived and rerun-stable
      val ids1 = df.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      val ids2 = Multimodal.ingestBinaryDir(spark, dir.getAbsolutePath,
          "image", glob = "*.png")
        .select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      assert(ids1 === ids2 && ids1.distinct.length === 3)
      // and the ingested bytes decode for real, exact dims recovered
      val dims = Multimodal.decodeFeatures(df, new Multimodal.RealDecoder())
        .select("width", "height").collect()
        .map(r => (r.getInt(0), r.getInt(1))).sorted
      assert(dims === Array((16, 12), (24, 12), (32, 12)))
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete(): Unit
    }
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
