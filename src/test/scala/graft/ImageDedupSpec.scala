package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Perceptual image dedup: encode→decode→dHash round trip, planted-copy
  * recall, and the banded join's guarantees. */
class ImageDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def specs(rows: (Long, Long, Int)*) = // (asset_id, seed, rplus)
    rows.toDF("asset_id", "seed", "rplus")
      .select(col("asset_id"), col("seed"), lit(9).as("w"), lit(7).as("h"),
        col("rplus"))

  private def hashes(rows: (Long, Long, Int)*) =
    Multimodal.imageDHash(spark,
      Multimodal.renderPngAssetsQuad(spark, specs(rows: _*)))

  test("identical seeds hash identically; a one-pixel nudge moves ≤ 1 bit") {
    val h = hashes((0L, 7L, 0), (1L, 7L, 0), (2L, 7L, 5), (3L, 8L, 0))
      .as[(Long, Option[Long])].collect().toMap
    assert(h(0L).get === h(1L).get)
    val d = java.lang.Long.bitCount(h(0L).get ^ h(2L).get)
    assert(d <= 1, s"perturbed copy moved $d bits")
    // different seed → unrelated image → many bits apart
    assert(java.lang.Long.bitCount(h(0L).get ^ h(3L).get) > 2)
  }

  test("near-dup pairs finds planted copies and only them") {
    val h = hashes(
      (10L, 10L, 0), (11L, 10L, 5),   // planted pair
      (20L, 20L, 0), (21L, 21L, 0),   // unrelated
      (30L, 30L, 0), (31L, 30L, 0))   // exact copy pair
    val pairs = Multimodal.imageNearDupPairs(h, bands = 7, maxHamming = 2)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs === Set((10L, 11L), (30L, 31L)))
  }

  test("undecodable payloads yield null hashes and never pair") {
    val junk = Seq((1L, Array[Byte](1, 2, 3))).toDF("asset_id", "content")
    val good = Multimodal.renderPngAssetsQuad(spark, specs((2L, 5L, 0)))
    val h = Multimodal.imageDHash(spark, junk.unionByName(good))
    assert(h.where(col("dhash").isNull).count() === 1)
    assert(Multimodal.imageNearDupPairs(h, 7, 2).count() === 0)
  }

  test("hot-bucket cap bounds an exact-copy cluster's pair fan-out") {
    // 10 exact copies collide in every band: uncapped C(10,2)=45 pairs,
    // cap 3 keeps the 3 lowest ids per bucket → C(3,2)=3 pairs — and a
    // genuine near-dup pair among low ids survives the cap
    val rows = (0L until 10L).map(i => (i, 100L, 0)) :+ (20L, 200L, 0) :+
      (21L, 200L, 5)
    val h = hashes(rows: _*)
    assert(Multimodal.imageNearDupPairs(h, 7, 2).count() === 46L)
    val capped = Multimodal.imageNearDupPairs(h, 7, 2, maxBucket = 3)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(capped === Set((0L, 1L), (0L, 2L), (1L, 2L), (20L, 21L)))
  }

  test("oversized inputs are rejected loudly, not silently truncated") {
    val big = Multimodal.renderPngAssetsQuad(spark,
      Seq((1L, 1L, 0)).toDF("asset_id", "seed", "rplus")
        .select(col("asset_id"), col("seed"), lit(16).as("w"),
          lit(16).as("h"), col("rplus")))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.imageDHash(spark, big).collect()
    }
    assert(e.getMessage.contains("pre-resized") ||
      e.getCause != null)
  }
}
