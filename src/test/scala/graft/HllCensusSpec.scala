package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HllCensus

/** The sketch census must be a faithful distinct-count algebra: segment
  * sketches merge to the same answer as a direct global sketch, appends
  * compose without read-modify-write, overlap can never overcount, and
  * the binary sketch column survives a parquet round-trip. All fixtures
  * sit in the DataSketches sparse-exact regime so assertions are
  * equality against exact `countDistinct`, not tolerance bands.
  */
class HllCensusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 30 days × 4 types; user ids overlap heavily across segments (the
    * case where additive folding would overcount massively). */
  private def events(fromDay: Int, untilDay: Int) = {
    val rows = for {
      day <- fromDay until untilDay
      i <- 0 until 200
    } yield (day.toLong, s"t${i % 4}", ((day * 7919 + i * 104729) % 3000).toLong)
    rows.toDF("day", "event_type", "user_id")
  }

  private val segCols = Seq(col("day"), col("event_type"))

  test("re-aggregated segment sketches equal exact distinct at every " +
      "granularity served from ONE sketch table") {
    val ev = events(0, 30)
    val sk = HllCensus.build(ev, segCols, col("user_id"))
    val perType = HllCensus.estimate(sk, Seq(col("event_type")), "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perDay = HllCensus.estimate(sk, Seq(col("day")), "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = HllCensus.estimateAll(sk, "n").collect().head.getLong(0)

    val exactType = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactDay = ev.groupBy("day")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactAll = ev.agg(countDistinct(col("user_id"))).collect().head.getLong(0)

    assert(perType === exactType)
    assert(perDay === exactDay)
    assert(global === exactAll && global > 0)
  }

  test("incremental add composes: append-only batches (including LATE " +
      "data into an existing segment) equal a full rebuild") {
    val all = events(0, 30)
    val sk0 = HllCensus.build(events(0, 20), segCols, col("user_id"))
    // batch 2: days 20-30 PLUS a replay of day 5 (late + duplicate
    // delivery) — union idempotence must absorb the overlap
    val late = events(20, 30).unionByName(events(5, 6))
    val sk1 = HllCensus.add(sk0, late, segCols, col("user_id"))
    // day 5 now has two sketch rows; estimate folds them
    assert(sk1.where(col("day") === 5).count() === 8) // 4 types × 2 rows
    val grown = HllCensus.estimate(sk1, Seq(col("event_type")), "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rebuilt = HllCensus.estimate(
      HllCensus.build(all, segCols, col("user_id")),
      Seq(col("event_type")), "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grown === rebuilt)
    // compact back to one row per segment without changing any answer
    val compacted = HllCensus.compact(sk1, segCols)
    assert(compacted.where(col("day") === 5).count() === 4)
    val afterCompact = HllCensus.estimate(compacted,
      Seq(col("event_type")), "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterCompact === rebuilt)
  }

  test("consecutive-segment overlap by inclusion-exclusion equals the " +
      "exact intersection (set algebra from sketches alone)") {
    val ev = events(0, 10)
    // day-keyed sketches with an uncompacted append-run on day 3
    val sk = HllCensus.add(
      HllCensus.build(ev, Seq(col("day")), col("user_id")),
      events(3, 4), Seq(col("day")), col("user_id"))
    val got = HllCensus.consecutiveOverlap(sk, "day")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    val byDay = ev.select("day", "user_id").distinct().collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val want = (0L until 9L).map { d =>
      (d, byDay(d).size.toLong, byDay(d + 1).size.toLong,
        (byDay(d) & byDay(d + 1)).size.toLong)
    }
    assert(got === want)
  }

  test("persisted sketch table round-trips through parquet and serves " +
      "a date-range slice without the raw rows") {
    val ev = events(0, 30)
    val dir = java.nio.file.Files.createTempDirectory("hllcensus").toString
    HllCensus.build(ev, segCols, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val window = HllCensus.estimateAll(
      reloaded.where(col("day").between(10, 19)), "n")
      .collect().head.getLong(0)
    val exact = ev.where(col("day").between(10, 19))
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(window === exact && window > 0)
  }
}
