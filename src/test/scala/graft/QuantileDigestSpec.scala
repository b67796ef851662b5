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

  test("deep merge trees: ~1,000 digests under flat, uniform and random " +
      "compact-of-compact chains all stay inside the 2εN rank bound") {
    // A serving table compacted repeatedly (QuantileCensus.compact after
    // every append run) merges digests under trees far deeper than the
    // shallow specs above. GK ε can in principle degrade per merge
    // LEVEL; Spark's compress re-tightens — this pins that the 2εN
    // contract the oracle asserts survives ~1,000-digest trees of
    // several shapes, that counts stay exact at every level, and that
    // the digest image stays small (compression keeps working) instead
    // of accreting per merge.
    val nSeg = 1000
    val perSeg = 200
    val df = (for {
      seg <- 0 until nSeg
      i <- 0 until perSeg
    } yield (seg.toLong,
      ((i * 2654435761L + seg * 40503L) % 10000).toDouble + seg * 20.0))
      .toDF("seg", "v")
    val all = df.select("v").collect().map(_.getDouble(0)).toSeq
    val digests = QuantileCensus.build(df, Seq(col("seg")), col("v"), eps)
      .localCheckpoint(true)
    assert(digests.count() === nSeg.toLong)
    val fr = (1 to 9).map(_ / 10.0) :+ 0.99
    def check(compacted: org.apache.spark.sql.DataFrame,
              tree: String): Unit = {
      val row = QuantileCensus.quantiles(compacted, Nil, fr).collect().head
      assert(row.getLong(0) === all.size.toLong, s"$tree: count drifted")
      fr.zipWithIndex.foreach { case (q, i) =>
        val v = row.getDouble(i + 1)
        assert(rankOk(all, v, q), s"$tree: q=$q returned $v out of bound")
      }
    }
    // shape 1: FLAT — all 1,000 digests in one merge aggregation (the
    // aggregation's own partial/final split already makes a 2-level tree)
    check(digests, "flat")
    // shape 2: uniform fan-in-10 compact-of-compact chain:
    // 1000 -> 100 -> 10 -> query (every level through compact())
    val u1 = QuantileCensus.compact(
      digests.withColumn("seg", expr("seg div 10")), Seq(col("seg")))
    val u2 = QuantileCensus.compact(
      u1.withColumn("seg", expr("seg div 10")), Seq(col("seg")))
    assert(u2.count() === 10L)
    // Size under deep merges: GK summaries are NOT fully mergeable
    // (Agarwal et al. 2012) — merged entries carry accumulated deltas
    // that saturate the compression threshold, so a digest merged from
    // m inputs grows ~linearly in m (measured here: the 10 level-2
    // digests total ~300 KB from 1,000 level-0 inputs) rather than
    // re-compressing to O(1/ε). The invariant that IS guaranteed, and
    // pinned: each compact level never EXPANDS total bytes, so an
    // append-run compact always shrinks the table, and the census
    // rebase cadence (rebuild from raw rows) bounds the slow per-merge
    // growth. A regression that duplicated entries outright would break
    // non-expansion.
    def totalBytes(d: org.apache.spark.sql.DataFrame): Long =
      d.select(sum(length(col("digest")))).collect().head.getLong(0)
    val (b0, b1, b2) = (totalBytes(digests), totalBytes(u1), totalBytes(u2))
    assert(b1 <= b0, s"level-1 compact expanded bytes: $b0 -> $b1")
    assert(b2 <= b1, s"level-2 compact expanded bytes: $b1 -> $b2")
    check(u2, "uniform-10x10")
    // the bounded-size escape: trimming the accreted level-2 digests at
    // a coarser ε collapses them to O(1/ε_trim) entries; the price is
    // the looser (ε_build + ε_trim) rank bound, which must still hold
    val trimEps = 0.02
    val trimmed = QuantileCensus.compact(
      u1.withColumn("seg", expr("seg div 10")), Seq(col("seg")),
      trimEps = Some(trimEps))
    val bt = totalBytes(trimmed)
    assert(bt < b2 / 10, s"trim must collapse accreted bytes: $b2 -> $bt")
    val trow = QuantileCensus.quantiles(trimmed, Nil, fr).collect().head
    assert(trow.getLong(0) === all.size.toLong, "trim changed the count")
    fr.zipWithIndex.foreach { case (q, i) =>
      val v = trow.getDouble(i + 1)
      val n = all.size
      val le = all.count(_ <= v)
      val lt = all.count(_ < v)
      assert(le >= (q - 2 * (eps + trimEps)) * n - 1 &&
        lt <= (q + 2 * (eps + trimEps)) * n + 1,
        s"trimmed q=$q returned $v outside the (eps+trim) bound")
    }
    // MIXED merge: a serving table where some segments were trimmed and
    // others weren't re-merges under the max-ε rule — count stays exact
    // and ranks hold the combined bound
    val mixed = QuantileCensus.compact(
        u1.where(expr("seg % 2 = 0")), Seq(col("seg")),
        trimEps = Some(trimEps))
      .unionByName(u1.where(expr("seg % 2 = 1")))
    val mrow = QuantileCensus.quantiles(mixed, Nil, fr).collect().head
    assert(mrow.getLong(0) === all.size.toLong, "mixed merge lost rows")
    fr.zipWithIndex.foreach { case (q, i) =>
      val v = mrow.getDouble(i + 1)
      val n = all.size
      assert(all.count(_ <= v) >= (q - 2 * (eps + trimEps)) * n - 1 &&
        all.count(_ < v) <= (q + 2 * (eps + trimEps)) * n + 1,
        s"mixed-merge q=$q returned $v outside the combined bound")
    }
    // shapes 3-5: RANDOM skewed chains — hash-salted regroupings give
    // uneven fan-ins (some groups swallow dozens of digests, some one),
    // depth 4, different tree per salt; compact-of-compact throughout
    for (salt <- Seq(1L, 2L, 3L)) {
      var t = digests.withColumn("seg", col("seg"))
      for (width <- Seq(137, 23, 4)) {
        t = QuantileCensus.compact(
          t.withColumn("seg",
            pmod(xxhash64(col("seg"), lit(salt)), lit(width.toLong))),
          Seq(col("seg")))
      }
      assert(t.count() <= 4L)
      check(t, s"random-chain-salt$salt")
    }
  }

  test("tightening the trim policy on an existing table is a no-op on " +
      "rows trimmed at a coarser eps — not a mid-query crash — while " +
      "finer rows keep trimming") {
    val segs = Seq(col("seg"))
    def batch(c: Int) = (for {
      seg <- 0 until 2; i <- 0 until 500
    } yield (seg.toLong,
      ((i * 2654435761L + (c * 2 + seg) * 40503L) % 10000).toDouble))
      .toDF("seg", "v")
    // accrete past the budget, then trim at a COARSE policy (0.05)
    var t = QuantileCensus.build(batch(0), segs, col("v"), eps)
    for (c <- 1 to 12)
      t = QuantileCensus.compact(
        QuantileCensus.add(t, batch(c), segs, col("v"), eps), segs)
    assert(QuantileCensus.trimNeeded(t, eps), "fixture never accreted")
    val coarse = QuantileCensus.compactSelfTrimming(t, segs, eps, 0.05)
    val recEps = coarse.select(
      graft.functions.QuantileDigest.quantile_digest_eps(col("digest")))
      .collect().map(_.getDouble(0))
    assert(recEps.forall(_ === 0.05), s"fixture rows not coarse: $recEps")
    // accrete the coarse table again so overBudget fires once more...
    var t2 = coarse
    for (c <- 13 to 24)
      t2 = QuantileCensus.compact(
        QuantileCensus.add(t2, batch(c), segs, col("v"), eps), segs)
    // ...and TIGHTEN the policy to 0.02: the raw trim on a 0.05-recorded
    // image is the crash being guarded against
    assertThrows[Exception] {
      t2.select(graft.functions.QuantileDigest
        .quantile_digest_trim(col("digest"), 0.02)).collect()
    }
    // the guarded door skips what it cannot tighten instead
    val tightened = QuantileCensus.compactSelfTrimming(t2, segs, eps, 0.02)
    val out = tightened.select(col("seg"),
      graft.functions.QuantileDigest.quantile_digest_eps(col("digest")),
      graft.functions.QuantileDigest.quantile_digest_count(col("digest")))
      .collect()
    assert(out.forall(_.getDouble(1) === 0.05),
      "a coarse row was 'tightened' after the fact")
    assert(out.forall(_.getLong(2) === 25L * 500),
      "count drifted through the no-op policy change")
    // a FRESH over-budget table (recorded eps = build eps) still trims
    // under the same 0.02 policy — the guard skips, it doesn't disable
    var fresh = QuantileCensus.build(batch(0), segs, col("v"), eps)
    for (c <- 1 to 12)
      fresh = QuantileCensus.compact(
        QuantileCensus.add(fresh, batch(c), segs, col("v"), eps), segs)
    val trimmed = QuantileCensus.compactSelfTrimming(fresh, segs, eps, 0.02)
    assert(trimmed.select(graft.functions.QuantileDigest
      .quantile_digest_eps(col("digest"))).collect()
      .forall(_.getDouble(0) === 0.02), "the tighter policy never trims")
  }

  test("self-trimming compaction keeps image bytes bounded over 40 " +
      "append/compact cycles with no manual trim call; the untrimmed " +
      "control accretes past the budget; ranks hold the trimmed bound") {
    val trimEps = 0.02
    val segs = Seq(col("seg"))
    def maxBytes(d: org.apache.spark.sql.DataFrame): Long =
      d.select(max(length(col("digest")))).collect().head.getInt(0).toLong
    // one shared stream of batches: 4 segments × 500 fresh values/cycle
    def batch(c: Int) = (for {
      seg <- 0 until 4; i <- 0 until 500
    } yield (seg.toLong,
      ((i * 2654435761L + (c * 4 + seg) * 40503L) % 10000).toDouble))
      .toDF("seg", "v")
    var auto = QuantileCensus.build(batch(0), segs, col("v"), eps)
    var ctrl = auto
    var all = Vector.empty[Double]
    var autoPeak = Vector.empty[Long]
    for (c <- 1 to 40) {
      all = all ++ (for (seg <- 0 until 4; i <- 0 until 500)
        yield ((i * 2654435761L + ((c - 1) * 4 + seg) * 40503L) % 10000)
          .toDouble)
      if (c < 40) {
        val b = batch(c)
        auto = QuantileCensus.compactSelfTrimming(
          QuantileCensus.add(auto, b, segs, col("v"), eps),
          segs, eps, trimEps)
        ctrl = QuantileCensus.compact(
          QuantileCensus.add(ctrl, b, segs, col("v"), eps), segs)
        autoPeak :+= maxBytes(auto)
      }
    }
    // bounded: every cycle's stored image stays under the policy's byte
    // budget — factor × the fresh-digest expectation at that cycle's
    // per-segment count (the table can approach the budget, the trim
    // resets it the cycle it crosses; the budget itself grows only
    // O(log n))
    def budgetBytes(n: Long): Double = {
      val entries = (1.0 / (2 * eps)) *
        (math.log(math.max(2 * eps * n, 2.0)) / math.log(2.0) + 2.0) + 16.0
      3.0 * (24.0 + 24.0 * entries)
    }
    autoPeak.zipWithIndex.foreach { case (b, i) =>
      val n = (i + 2).toLong * 500 // per-segment rows after cycle i+1
      assert(b <= budgetBytes(n),
        s"cycle ${i + 1}: $b bytes over the ${budgetBytes(n)} budget " +
          s"trace=$autoPeak")
    }
    // and the steady state after the first reset sits FAR under the
    // budget, not riding it (the trim collapses to O(1/eps_trim))
    assert(autoPeak.takeRight(20).max < budgetBytes(20000) / 5,
      s"steady state not collapsed: $autoPeak")
    // the control demonstrates the accretion is real: by cycle 40 it
    // blows past the budget the policy enforces
    assert(maxBytes(ctrl) > budgetBytes(20000),
      s"control never accreted (ctrl=${maxBytes(ctrl)}) — the policy " +
        "is pointless at this shape")
    assert(QuantileCensus.trimNeeded(ctrl, eps),
      "trigger blind to the accreted control")
    assert(!QuantileCensus.trimNeeded(auto, eps),
      "trigger still firing on the self-maintained table")
    // correctness under the policy: count exact, ranks within the
    // trimmed (2·(eps+trimEps)) bound at every decile
    val fr = (1 to 9).map(_ / 10.0)
    val row = QuantileCensus.quantiles(auto, Nil, fr).collect().head
    assert(row.getLong(0) === all.size.toLong, "self-trim lost rows")
    val sorted = all.sorted
    fr.zipWithIndex.foreach { case (q, i) =>
      val v = row.getDouble(i + 1)
      val n = sorted.size
      assert(sorted.count(_ <= v) >= (q - 2 * (eps + trimEps)) * n - 1 &&
        sorted.count(_ < v) <= (q + 2 * (eps + trimEps)) * n + 1,
        s"q=$q outside the trimmed bound after 40 cycles")
    }
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
