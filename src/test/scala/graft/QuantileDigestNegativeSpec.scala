package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.QuantileDigest._

/** Corrupt digest images must fail loudly — a truncated or foreign
  * binary fed to the merge/query path must raise, never deserialize
  * into a silently wrong summary (the negative-decode discipline the
  * binary-fsimage door established in round 9). */
class QuantileDigestNegativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def goodDigest: Array[Byte] = {
    val rows = (1 to 100).map(i => i.toDouble).toDF("v")
    rows.agg(quantile_digest_agg(col("v"), 0.01).as("d"))
      .collect().head.getAs[Array[Byte]](0)
  }

  test("a truncated digest image fails the query, not answers it") {
    val bytes = goodDigest
    assert(bytes.length > 24)
    val truncated = bytes.take(bytes.length / 2)
    intercept[Exception] {
      Seq(truncated).toDF("d")
        .select(quantile_digest_query(col("d"), 0.5)).collect()
    }
  }

  test("a truncated digest image fails the re-merge") {
    val bytes = goodDigest
    intercept[Exception] {
      Seq(bytes.take(8)).toDF("d")
        .agg(quantile_digest_merge_agg(col("d"))).collect()
    }
  }

  test("a sample-count field larger than the payload fails, never " +
      "fabricates samples") {
    val bytes = goodDigest.clone()
    // the sampled-array length lives at offset 20 (int threshold,
    // double eps, long count precede it) — inflate it past the payload
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(20, Int.MaxValue / 2)
    intercept[Exception] {
      Seq(bytes).toDF("d")
        .select(quantile_digest_count(col("d"))).collect()
    }
  }

  test("a corrupt HLL sketch image fails the union loudly (DataSketches " +
      "validates its own wire format)") {
    val good = Seq("a", "b", "c").toDF("v")
      .agg(expr("hll_sketch_agg(v, 18)").as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    assert(good.length > 8)
    val corrupt = good.clone(); corrupt(0) = (corrupt(0) ^ 0x5A).toByte
    intercept[Exception] {
      Seq(corrupt).toDF("sk")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).collect()
    }
    // truncation fails too
    intercept[Exception] {
      Seq(good.take(4)).toDF("sk")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).collect()
    }
  }

  test("trim: eps outside (0,1) fails loudly; a truncated image fails; " +
      "a null digest trims to null") {
    intercept[Exception] {
      Seq(goodDigest).toDF("d")
        .select(quantile_digest_trim(col("d"), 1.5)).collect()
    }
    intercept[Exception] {
      Seq(goodDigest.take(8)).toDF("d")
        .select(quantile_digest_trim(col("d"), 0.05)).collect()
    }
    val r = Seq(Option.empty[Array[Byte]]).toDF("d")
      .select(quantile_digest_trim(col("d"), 0.05)).collect().head
    assert(r.isNullAt(0))
  }

  test("trim tighter than the build eps fails loudly — a digest cannot " +
      "tighten its recorded error after the fact") {
    val ex = intercept[Exception] {
      Seq(goodDigest).toDF("d") // built at eps = 0.01
        .select(quantile_digest_trim(col("d"), 0.005)).collect()
    }
    assert(ex.getMessage.contains("coarser"),
      s"wrong failure: ${ex.getMessage}")
    // equal eps is the boundary: allowed (a same-eps re-compress)
    val same = Seq(goodDigest).toDF("d")
      .select(quantile_digest_count(quantile_digest_trim(col("d"), 0.01)))
      .collect().head.getLong(0)
    assert(same === 100L)
  }

  test("trim-policy triggers validate their knobs: eps outside (0,1) " +
      "and factor < 1 fail fast") {
    val digests = Seq(goodDigest).toDF("digest")
    intercept[IllegalArgumentException] {
      graft.operators.QuantileCensus.trimNeeded(digests, 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.QuantileCensus.trimNeeded(digests, 0.01, factor = 0.5)
    }
    intercept[IllegalArgumentException] {
      graft.operators.QuantileCensus.compactSelfTrimming(
        Seq((1L, goodDigest)).toDF("seg", "digest"),
        Seq(org.apache.spark.sql.functions.col("seg")),
        relativeError = 0.01, trimEps = 0.005) // tighter than build
    }
  }

  test("an intact image still round-trips after the negative cases " +
      "(no shared-state corruption)") {
    val n = Seq(goodDigest).toDF("d")
      .select(quantile_digest_count(col("d"))).collect().head.getLong(0)
    assert(n === 100L)
  }
}
