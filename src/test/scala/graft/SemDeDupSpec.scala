package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Similarity

/** SemDeDup semantics: within-cell-only pair search, the keep-least-central
  * rule, and the higher-id tiebreak. */
class SemDeDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // nlist=2 seeds the quantizer from ids 0 and 1: cell 0 ≈ x-axis,
  // cell 1 ≈ y-axis. τ = 0.999 keeps the seed↔member sims (≤ 0.994)
  // out of the pair set.
  private val corpus = Seq(
    (0L, Seq(1.0f, 0.0f)),    // seed / centroid of cell 0
    (1L, Seq(0.0f, 1.0f)),    // seed / centroid of cell 1
    (10L, Seq(0.9f, 0.1f)),   // cell 0, near-dup of 11, MORE central
    (11L, Seq(0.9f, 0.11f)),  // cell 0, near-dup of 10, less central
    (12L, Seq(0.1f, 0.9f)),   // cell 1, no duplicate
    (20L, Seq(0.6f, 0.8f)),   // cell 1, exact dup of 21
    (21L, Seq(0.6f, 0.8f))    // cell 1, exact dup of 20 (tie → dropped)
  ).toDF("vec_id", "embedding")

  test("drops the more-central member of each within-cell duplicate pair") {
    val drops = Similarity.semDeDupDrops(corpus, nlist = 2,
        thresholdPpm = 999000L)
      .select("nid", "cell").as[(Long, Long)].collect().sortBy(_._1)
    // 10 dropped (more central than 11); 21 dropped (tie with 20 → higher
    // id); the seeds and 12 never pair — cross-cell sims are below τ
    assert(drops.toSeq === Seq((10L, 0L), (21L, 1L)))
  }

  test("census: totals, keepers and dup-cell count") {
    val c = Similarity.semDeDupCensus(corpus, nlist = 2,
        thresholdPpm = 999000L)
      .select("total_vecs", "kept_vecs", "dropped_vecs", "cells_with_dups")
      .as[(Long, Long, Long, Long)].collect().head
    assert(c === ((7L, 5L, 2L, 2L)))
  }

  test("pairs in different cells are invisible even above threshold") {
    // identical vectors forced into different cells: 30 lands in cell 0,
    // 31 in cell 1 is impossible for identical vectors — instead verify
    // via near-identical vectors straddling the bisector, each snapping
    // to its own cell; cos(a, b) ≈ 1 but no pair is emitted
    val straddle = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (30L, Seq(0.71f, 0.70f)),  // argmax → cell 0
      (31L, Seq(0.70f, 0.71f))   // argmax → cell 1
    ).toDF("vec_id", "embedding")
    val drops = Similarity.semDeDupDrops(straddle, nlist = 2,
      thresholdPpm = 999000L).count()
    assert(drops === 0L)
  }
}
