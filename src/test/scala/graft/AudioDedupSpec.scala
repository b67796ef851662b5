package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Perceptual audio dedup: encode→decode→fingerprint round trip, planted
  * near-dup recall, and the shared banded hamming join over `afp`. */
class AudioDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 57 * 32

  private def specs(rows: (Long, Long, Int)*) = // (asset_id, seed, aplus)
    rows.toDF("asset_id", "seed", "aplus")
      .select(col("asset_id"), col("seed"), lit(8000).as("rate"),
        lit(N).as("n"), lit(57).as("windows"), col("aplus"))

  private def fps(rows: (Long, Long, Int)*) =
    Multimodal.audioFingerprint(spark,
      Multimodal.renderWavAssetsSeeded(spark, specs(rows: _*)))

  test("identical seeds fingerprint identically; a window-0 amp bump moves ≤ 1 bit") {
    val h = fps((0L, 7L, 0), (1L, 7L, 0), (2L, 7L, 200), (3L, 8L, 0))
      .as[(Long, Option[Long])].collect().toMap
    assert(h(0L).get === h(1L).get)
    val d = java.lang.Long.bitCount(h(0L).get ^ h(2L).get)
    assert(d <= 1, s"amp-bumped copy moved $d bits")
    // different seed → different energy envelope → many bits apart
    assert(java.lang.Long.bitCount(h(0L).get ^ h(3L).get) > 2)
  }

  test("near-dup pairs finds planted copies and only them") {
    val h = fps(
      (10L, 10L, 0), (11L, 10L, 200), // planted pair
      (20L, 20L, 0), (21L, 21L, 0),   // unrelated
      (30L, 30L, 0), (31L, 30L, 0))   // exact copy pair
    val pairs = Multimodal
      .hammingNearDupPairs(h, "afp", 56, bands = 7, maxHamming = 2)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs === Set((10L, 11L), (30L, 31L)))
  }

  test("undecodable and too-short payloads yield null fingerprints") {
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, Multimodal.syntheticWav(5L, 8000, 40))) // 40 samples < 57 windows
      .toDF("asset_id", "content")
    val h = Multimodal.audioFingerprint(spark, junk)
    assert(h.where(col("afp").isNull).count() === 2)
    assert(Multimodal
      .hammingNearDupPairs(h, "afp", 56, bands = 7, maxHamming = 2)
      .count() === 0)
  }

  test("the fingerprint survives a PCM re-encode (decode path, not payload bytes)") {
    // same samples behind a different container prefix: decode both, equal fps
    val a = Multimodal.renderWavAssetsSeeded(spark, specs((1L, 9L, 0)))
    val fp1 = Multimodal.audioFingerprint(spark, a)
      .as[(Long, Option[Long])].collect().head._2.get
    // re-encode: decode to samples, rebuild the WAV at a different rate tag
    val bytes = a.select("content").as[Array[Byte]].collect().head
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val pcm = ais.readAllBytes()
    val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(16000 * 2)
      .putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(pcm.length).put(pcm)
    val re = Seq((2L, bb.array())).toDF("asset_id", "content")
    val fp2 = Multimodal.audioFingerprint(spark, re)
      .as[(Long, Option[Long])].collect().head._2.get
    assert(fp1 === fp2)
  }
}
