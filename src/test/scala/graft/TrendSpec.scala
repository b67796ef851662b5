package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TrendAnalysis

/** Regression-slope semantics of the trend operator: exact slopes, the
  * truncation-toward-zero rule at non-divisible boundaries (the rule the
  * DuckDB oracle mirrors with non-negative `//`), and the census. */
class TrendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hist(rows: (String, Long, Long, Long)*) =
    rows.toDF("user", "cycle", "bytes", "files")

  private def slopes(rows: (String, Long, Long, Long)*): Map[String, Long] =
    TrendAnalysis.trend(hist(rows: _*), Seq("user"), "cycle", Seq("bytes"))
      .select("user", "bytesSlopeMilli").as[(String, Long)]
      .collect().toMap

  test("exact linear series recover their slope in milli units") {
    val s = slopes(
      ("up", 0L, 7L, 1L), ("up", 1L, 10L, 1L), ("up", 2L, 13L, 1L),   // 3x+7
      ("down", 0L, 9L, 1L), ("down", 1L, 7L, 1L), ("down", 2L, 5L, 1L), // -2x+9
      ("flat", 0L, 4L, 1L), ("flat", 1L, 4L, 1L), ("flat", 2L, 4L, 1L))
    assert(s === Map("up" -> 3000L, "down" -> -2000L, "flat" -> 0L))
  }

  test("non-divisible slopes truncate toward zero (oracle rule)") {
    // x = 0,1,2 / y = 0,0,1: num = 3·2 - 3·1 = 3, den = 6 → 0.5 → 500
    assert(slopes(("h", 0L, 0L, 1L), ("h", 1L, 0L, 1L), ("h", 2L, 1L, 1L))
      === Map("h" -> 500L))
    // x = 0,1,3 / y = 0,1,0: num = 3·1 - 4·1 = -1, den = 3·10 - 16 = 14
    // → -1000/14 = -71.43 → truncation gives -71 (floor would give -72)
    assert(slopes(("t", 0L, 0L, 1L), ("t", 1L, 1L, 1L), ("t", 3L, 0L, 1L))
      === Map("t" -> -71L))
  }

  test("first/last/delta track the x extremes, not row order") {
    val t = TrendAnalysis.trend(
      hist(("u", 2L, 30L, 5L), ("u", 0L, 10L, 9L), ("u", 1L, 99L, 7L)),
      Seq("user"), "cycle", Seq("bytes", "files"))
      .select("nCycles", "bytesFirst", "bytesLast", "bytesDelta",
        "filesFirst", "filesLast", "filesDelta")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(t === ((3L, 10L, 30L, 20L, 9L, 5L, -4L)))
  }

  test("census buckets keys by slope sign and sums the net delta") {
    val trended = TrendAnalysis.trend(hist(
      ("a", 0L, 0L, 1L), ("a", 1L, 10L, 1L),
      ("b", 0L, 10L, 1L), ("b", 1L, 0L, 1L),
      ("c", 0L, 5L, 1L), ("c", 1L, 5L, 1L),
      ("d", 3L, 7L, 1L)), // single cycle: slope undefined, delta 0
      Seq("user"), "cycle", Seq("bytes"))
    val c = TrendAnalysis.census(trended, "bytes")
      .select("nKeys", "growing", "shrinking", "flat", "undetermined",
        "netDelta")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(c === ((4L, 1L, 1L, 1L, 1L, 0L)))
  }

  test("a single-cycle key gets a NULL slope, not a crash or a fake 0") {
    val t = TrendAnalysis.trend(hist(("solo", 2L, 42L, 3L)),
      Seq("user"), "cycle", Seq("bytes"))
      .select("nCycles", "bytesFirst", "bytesLast", "bytesDelta")
      .as[(Long, Long, Long, Long)].collect().head
    assert(t === ((1L, 42L, 42L, 0L)))
    val s = TrendAnalysis.trend(hist(("solo", 2L, 42L, 3L)),
      Seq("user"), "cycle", Seq("bytes"))
      .select("bytesSlopeMilli").collect().head
    assert(s.isNullAt(0))
  }

  test("decimal accumulation survives near-2^63 byte totals") {
    // per-cycle bytes ~ 4.6e18: Σxy over longs would wrap, decimals must not
    val b = 4600000000000000000L
    val s = TrendAnalysis.trend(
      hist(("big", 0L, b, 1L), ("big", 1L, b + 1000L, 1L),
           ("big", 2L, b + 2000L, 1L)),
      Seq("user"), "cycle", Seq("bytes"))
      .select("bytesSlopeMilli").as[Long].collect().head
    assert(s === 1000000L) // slope 1000 bytes/cycle
  }
}
