package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-dup: real PNG payloads through the real
  * codec (javax.imageio), pHash bits recomputed by hand against the
  * builtin-expression pipeline, and the planted-duplicate structure of
  * the q119 fixture — near-identical images pair, distinct ones don't.
  */
class PhashNearDupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("graft-phash").toString
  private lazy val fixture = Multimodal.imageFixtureParquet(spark, s"$tmp/img", 60)
  private lazy val decoded = Multimodal.decodedRasterParquet(
    spark, s"$tmp/dec", fixture, new Multimodal.RealDecoder(8)).cache()

  private def refSig(feature: scala.collection.Seq[Float]): Long = {
    val q = feature.map(x => math.round(x.toDouble * 1000000))
    val s = q.sum
    (0 until 60).foldLeft(0L)((acc, i) => if (q(i) * 64 > s) acc | (1L << i) else acc)
  }

  test("fixture decodes through the real codec; sig60 equals the by-hand pHash") {
    val rows = decoded.collect()
    assert(rows.length === 60)
    rows.foreach(r => assert(r.getAs[Seq[Float]](1).length === 64, s"row ${r.getLong(0)}"))
    val want = rows.map(r => r.getLong(0) -> refSig(r.getAs[Seq[Float]](1))).toMap
    val got = Phash.sig60(decoded, "id", "feature")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("byte-exact copies pair at Hamming 0, perturbed twins within 3, distinct bases never pair") {
    val pairs = Phash.pairs(decoded, "id", "feature", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // every decade: 9 is a byte-exact PNG copy of 0 → identical raster
    (0L until 60L by 10).foreach { b =>
      assert(pairs.get((b, b + 9)).contains(0), s"exact copy pair ($b, ${b + 9})")
    }
    // 8 is a one-pixel brightening of 0 — a genuine near-twin
    (0L until 60L by 10).foreach { b =>
      assert(pairs.contains((b, b + 8)), s"perturbed pair ($b, ${b + 8})")
      assert(pairs((b, b + 8)) <= 3)
    }
    // no pair crosses decades: distinct seeded noise images never collide
    pairs.keys.foreach { case (a, b) => assert(a / 10 === b / 10, s"($a, $b)") }
  }

  test("blocked pair join equals brute force on the signature set") {
    val sigs = Phash.sig60(decoded, "id", "feature")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (ia, ib, d)).toSet
    val got = Phash.pairs(decoded, "id", "feature", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === brute)
  }

  private lazy val audioDecoded = Multimodal.decodedRasterParquet(
    spark, s"$tmp/adec",
    Multimodal.audioFixtureParquet(spark, s"$tmp/wav", 60),
    new Multimodal.RealDecoder(8)).cache()

  test("audio: WAV fixture decodes through javax.sound; planted structure pairs exactly") {
    val rows = audioDecoded.collect()
    assert(rows.length === 60)
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Float]](1)
      assert(f.length === 64 && f.exists(_ > 0f), s"row ${r.getLong(0)}")
    }
    val pairs = Phash.pairs(audioDecoded, "id", "feature", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    (0L until 60L by 10).foreach { b =>
      assert(pairs.get((b, b + 9)).contains(0), s"exact copy pair ($b, ${b + 9})")
      assert(pairs.contains((b, b + 8)) && pairs((b, b + 8)) <= 3,
        s"perturbed pair ($b, ${b + 8})")
    }
    pairs.keys.foreach { case (a, b) => assert(a / 10 === b / 10, s"($a, $b)") }
  }

  test("signaturePairs rejects non-divisible block layouts") {
    val df = Seq((1L, 5L)).toDF("id", "sig")
    intercept[IllegalArgumentException](
      NearDup.signaturePairs(df, "id", "sig", maxDist = 6, sigBits = 60))
  }
}
