package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Video near-dup via frame-hash-set overlap: real per-frame dHash, set
  * semantics, the ppm-exact Jaccard, and the shared-intro-frame cap. */
class VideoDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (video_id, frame seed) → real rendered PNG → real decoded dHash
  private def frameHashes(rows: (Long, Long)*) = {
    val specs = rows.zipWithIndex
      .map { case ((v, s), i) => (i.toLong, v, s) }
      .toDF("asset_id", "vid", "seed")
    val hashed = Multimodal.imageDHash(spark,
      Multimodal.renderPngAssetsQuad(spark,
        specs.select(col("asset_id"), col("seed"),
          lit(9).as("w"), lit(7).as("h"), lit(0).as("rplus"))))
    hashed.join(specs.select(col("asset_id"), col("vid")), Seq("asset_id"))
      .select(col("vid").as("video_id"), col("dhash"))
  }

  test("overlapping frame sets pair with the exact Jaccard; disjoint ones never") {
    // videos 1 and 2 share 3 of their 4 frames → J = 3/5 = 600000 ppm;
    // video 3 is disjoint
    val h = frameHashes(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 10L), (2L, 11L), (2L, 12L), (2L, 99L),
      (3L, 50L), (3L, 51L), (3L, 52L), (3L, 53L))
    val pairs = Multimodal.frameSetNearDupPairs(h, 500000L)
      .select("vida", "vidb", "shared", "jaccard_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 3L, 600000L)))
    assert(Multimodal.frameSetNearDupPairs(h, 700000L).count() === 0)
  }

  test("duplicate frames within one video collapse to set semantics") {
    // video 1 repeats one frame 3 times — still 2 distinct hashes
    val h = frameHashes(
      (1L, 10L), (1L, 10L), (1L, 10L), (1L, 11L),
      (2L, 10L), (2L, 11L))
    val p = Multimodal.frameSetNearDupPairs(h, 500000L)
      .select("vida", "vidb", "shared", "jaccard_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(p === Set((1L, 2L, 2L, 1000000L)))
  }

  test("a shared intro frame alone never qualifies, and the cap bounds its fan-out") {
    // 6 videos all share frame 7 (an intro card) plus 3 own frames:
    // J = 1/7 < threshold, so no pairs — and with maxPerHash = 2 the
    // intro hash contributes at most one candidate pair
    val rows = (1L to 6L).flatMap(v =>
      Seq((v, 7L), (v, 100L * v), (v, 100L * v + 1), (v, 100L * v + 2)))
    val h = frameHashes(rows: _*)
    assert(Multimodal.frameSetNearDupPairs(h, 500000L).count() === 0)
    val capped = Multimodal.frameSetNearDupPairs(h, 1L, maxPerHash = 2)
      .select("vida", "vidb").as[(Long, Long)].collect().toSet
    assert(capped === Set((1L, 2L)))
  }
}
