package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QuantileCensus

/** The quantile digest must honor the GK contract through every path a
  * census uses it: segment build → parquet persistence → re-merge →
  * query, with exact counts and ε-bounded ranks against the exact
  * sorted truth, including appends and compaction. */
class QuantileDigestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eps = 0.01

  /** 20 segments × 500 values with distinct per-segment distributions
    * (so a merged quantile is NOT any single segment's quantile). */
  private def data(fromSeg: Int, untilSeg: Int) =
    (for {
      seg <- fromSeg until untilSeg
      i <- 0 until 500
    } yield (seg.toLong,
      ((i * 2654435761L + seg * 40503L) % 10000).toDouble + seg * 100.0))
      .toDF("seg", "v")

  /** exact rank bound: the digest's answer at q must have exact rank
    * within 2εN of qN (2ε: one ε from the build, one from the merge). */
  private def rankOk(all: Seq[Double], v: Double, q: Double): Boolean = {
    val n = all.size
    val le = all.count(_ <= v)
    val lt = all.count(_ < v)
    le >= (q - 2 * eps) * n - 1 && lt <= (q + 2 * eps) * n + 1
  }

  test("merged segment digests answer within the rank bound at every " +
      "decile; count is exact; round-trips parquet") {
    val df = data(0, 20)
    val dir = java.nio.file.Files.createTempDirectory("qdig").toString
    QuantileCensus.build(df, Seq(col("seg")), col("v"), eps)
      .write.mode("overwrite").parquet(dir)
    val digests = spark.read.parquet(dir)
    val fr = (1 to 9).map(_ / 10.0)
    val row = QuantileCensus.quantiles(digests, Nil, fr).collect().head
    val all = df.select("v").collect().map(_.getDouble(0)).toSeq
    assert(row.getLong(0) === all.size.toLong)
    fr.zipWithIndex.foreach { case (q, i) =>
      val v = row.getDouble(i + 1)
      assert(rankOk(all, v, q), s"q=$q returned $v outside the rank bound")
    }
  }

  test("grouped re-merge: per-group window quantiles from the ONE " +
      "digest table match per-group exact medians' rank bounds") {
    val df = data(0, 20).withColumn("grp", col("seg") % 4)
    val digests = QuantileCensus.build(df, Seq(col("seg"), col("grp")),
      col("v"), eps)
    val got = QuantileCensus.quantiles(digests, Seq(col("grp")), Seq(0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 4)
    got.foreach { case (g, n, p50) =>
      val vals = df.where(col("grp") === g).select("v")
        .collect().map(_.getDouble(0)).toSeq
      assert(n === vals.size.toLong)
      assert(rankOk(vals, p50, 0.5), s"grp=$g median $p50 out of bound")
    }
  }

  test("append + compact: late segment rows fold in; compaction is " +
      "count-preserving and keeps answers in bound") {
    val base = QuantileCensus.build(data(0, 15), Seq(col("seg")), col("v"), eps)
    val grown = QuantileCensus.add(base, data(15, 20), Seq(col("seg")),
      col("v"), eps)
    val all = data(0, 20).select("v").collect().map(_.getDouble(0)).toSeq
    val row = QuantileCensus.quantiles(grown, Nil, Seq(0.5, 0.99))
      .collect().head
    assert(row.getLong(0) === all.size.toLong)
    assert(rankOk(all, row.getDouble(1), 0.5))
    assert(rankOk(all, row.getDouble(2), 0.99))
    // duplicate-segment append-run, then compact to one row per segment
    val dup = grown.unionByName(
      QuantileCensus.build(data(5, 6), Seq(col("seg")), col("v"), eps))
    val compacted = QuantileCensus.compact(dup, Seq(col("seg")))
    assert(compacted.count() === 20L)
    // the duplicated segment's values count twice — counts stay exact
    val n2 = QuantileCensus.quantiles(compacted, Nil, Seq(0.5))
      .collect().head.getLong(0)
    assert(n2 === all.size.toLong + 500L)
  }

  test("nulls are skipped exactly; an empty digest queries to null") {
    val df = Seq[(Long, Option[Double])]((0L, Some(1.0)), (0L, None),
      (0L, Some(3.0)), (1L, None)).toDF("seg", "v")
    val digests = QuantileCensus.build(df, Seq(col("seg")), col("v"), eps)
    val rows = QuantileCensus.quantiles(digests, Seq(col("seg")), Seq(0.5))
      .orderBy("seg").collect()
    assert(rows(0).getLong(1) === 2L && !rows(0).isNullAt(2))
    assert(rows(1).getLong(1) === 0L && rows(1).isNullAt(2))
  }
}
