package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.SketchHistory

/** The sketch history must answer the two questions the exact history
  * cannot once old namespaces are gone: window-distinct owners and
  * moving percentiles — each checked here against exact recomputation
  * from the (test-retained) cycle frames. */
class SketchHistorySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  /** Cycle k: half the owners are a stable pool, half are cycle-local
    * (so window distinct ≠ any cycle's distinct and ≠ their sum), and
    * odd-id file sizes grow with k (so percentiles genuinely move). */
  private def cycle(k: Int) = graft.inodes.InodeView
    .inodes(spark, dir).where(col("isFile"))
    .withColumn("user", when(col("id") % 2 === 0, col("user"))
      .otherwise(concat(col("user"), lit(s"-c$k"))))
    .withColumn("fileSize", when(col("id") % 2 === 1,
      col("fileSize") * (k + 1)).otherwise(col("fileSize")))

  test("window distinct owners and moving percentiles serve from the " +
      "history rows alone, matching exact recomputation") {
    val hp = java.nio.file.Files.createTempDirectory("skhist").toString +
      "/hist"
    val cycles = (0 until 3).map(cycle)
    cycles.zipWithIndex.foreach { case (c, k) =>
      SketchHistory.append(c, hp, 1000L * (k + 1))
    }
    val hist = SketchHistory.read(spark, hp)
    assert(hist.count() === 3)

    // 1) distinct owners over the full window — unanswerable from
    // additive history rows; exact here because HLL sits sparse
    val exactUsers = cycles.map(_.select("user").distinct()
      .collect().map(_.getString(0)).toSet).reduce(_ ++ _)
    val got = SketchHistory.distinctUsersOver(hist, 0L, 9999L)
      .collect().head.getLong(0)
    assert(got === exactUsers.size.toLong)
    // and a sub-window (cycles 2..3 only)
    val exactTail = cycles.drop(1).map(_.select("user").distinct()
      .collect().map(_.getString(0)).toSet).reduce(_ ++ _)
    val gotTail = SketchHistory.distinctUsersOver(hist, 2000L, 3000L)
      .collect().head.getLong(0)
    assert(gotTail === exactTail.size.toLong)

    // 2) per-cycle p50/p99 from the stored digests: rank-banded against
    // each cycle's exact values; counts exact; p99 strictly rises
    val per = SketchHistory.sizePercentiles(hist, Seq(0.5, 0.99))
      .collect()
    val p99s = per.map(_.getDouble(3))
    per.zipWithIndex.foreach { case (r, k) =>
      val vals = cycles(k).select(col("fileSize").cast("double"))
        .collect().map(_.getDouble(0)).sorted
      assert(r.getLong(1) === vals.length.toLong)
      for ((q, i) <- Seq(0.5 -> 2, 0.99 -> 3)) {
        val v = r.getDouble(i)
        val le = vals.count(_ <= v); val lt = vals.count(_ < v)
        assert(le >= (q - 0.002) * vals.length - 1 &&
          lt <= (q + 0.002) * vals.length + 1,
          s"cycle $k q=$q served $v outside the rank band")
      }
    }
    assert(p99s(0) < p99s(2), "growing odd-id sizes must move the p99")

    // 3) whole-window percentile from one digest re-merge
    val allVals = cycles.flatMap(_.select(col("fileSize").cast("double"))
      .collect().map(_.getDouble(0)))
    val w = SketchHistory.sizePercentilesOver(hist, 0L, 9999L).collect().head
    assert(w.getLong(0) === allVals.size.toLong)
    val p99 = w.getDouble(2)
    val le = allVals.count(_ <= p99); val lt = allVals.count(_ < p99)
    assert(le >= (0.99 - 0.002) * allVals.size - 1 &&
      lt <= (0.99 + 0.002) * allVals.size + 1)
  }
}
