package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: for every point row, find the interval
  * rows with `start <= point <= end`.
  *
  * Spark has no native range-join operator — a raw non-equi join plans as
  * BroadcastNestedLoopJoin (quadratic work, broadcast-sized right) which
  * dies at any real scale. This is the standard bucketization rewrite
  * (composition-first, rule (a) of the build plan — the same technique
  * Databricks' range-join optimization applies under the hood):
  *
  *   1. each interval explodes to the bucket ids its span covers
  *      (`sequence(floor(start/w), floor(end/w))` — `len/w + 1` rows);
  *   2. each point maps to its ONE bucket id (`floor(point/w)`);
  *   3. equi-join on the bucket id — a plain shuffled hash join Catalyst
  *      and AQE optimize like any other;
  *   4. the exact `start <= p <= end` predicate filters survivors. A
  *      point meets a covering interval in exactly one bucket (the
  *      point's own), so no pair dedup is needed.
  *
  * Cost: one shuffle keyed on bucket id, join input sizes
  * `points + intervals · (span/w + 1)`. Pick `bucketWidth` ~ the median
  * interval span: too small multiplies the interval fan-out, too large
  * piles unrelated points into each bucket (the all-pairs hazard this
  * rewrite exists to avoid). Intervals and points carry only the columns
  * the caller selected — project before calling at 100 TB.
  */
object RangeJoin {

  /** Truncating bucket division with a per-row sign guard: `div`
    * truncates toward zero, so on a NEGATIVE value it disagrees with
    * floor and the point lands in a different bucket than the interval
    * explode covers — qualifying pairs would be SILENTLY dropped. The
    * guard turns that into a loud failure (one branch per row, stays in
    * codegen). `floor(x / w)` is no alternative: double division loses
    * exactness past 2^53, which epoch-nanos exceed. */
  private def guardedBucket(c: String, w: Long): String =
    s"CASE WHEN `$c` < 0 THEN raise_error(" +
      s"'rangeJoin: negative $c — truncating div disagrees with floor') " +
      s"ELSE `$c` div $w END"

  /** Data-driven bucket width: ≈ the p95 interval span, collected as ONE
    * scalar aggregation over the (already caller-projected) interval side.
    * A caller-fixed width that mis-sizes at 100× scale (intervals ≫
    * bucket) multiplies the explode fan-out by span/width per interval;
    * anchoring to p95 bounds the fan-out of 95% of intervals at ≤ 2
    * buckets each, so candidate rows stay O(points + intervals·spanFactor)
    * no matter how the interval distribution drifts. Tail intervals above
    * p95 still fan out span/p95 — by definition ≤ 5% of rows. The collect
    * is two scalars (p95, a non-empty guard), not data-sized. */
  def autoBucketWidth(intervals: DataFrame, startCol: String,
                      endCol: String): Long = {
    val r = intervals.agg(
      expr(s"approx_percentile(`$endCol` - `$startCol`, 0.95)"),
      count(lit(1))).head
    if (r.isNullAt(0) || r.getLong(1) == 0L) 1L
    else math.max(1L, r.getLong(0))
  }

  /** [[rangeJoin]] with the bucket width chosen from the interval data
    * itself ([[autoBucketWidth]]). */
  def rangeJoinAuto(points: DataFrame, pointCol: String,
                    intervals: DataFrame, startCol: String,
                    endCol: String): DataFrame =
    rangeJoin(points, pointCol, intervals, startCol, endCol,
      autoBucketWidth(intervals, startCol, endCol))

  /** [[intervalOverlapJoin]] with the bucket width chosen from BOTH sides'
    * spans pooled (the fan-out hazard is symmetric). */
  def intervalOverlapJoinAuto(left: DataFrame, leftStart: String, leftEnd: String,
                              right: DataFrame, rightStart: String,
                              rightEnd: String): DataFrame = {
    val spans = left.select((col(leftEnd) - col(leftStart)).as("s"))
      .unionAll(right.select((col(rightEnd) - col(rightStart)).as("s")))
    val r = spans.agg(expr("approx_percentile(s, 0.95)"), count(lit(1))).head
    val w = if (r.isNullAt(0) || r.getLong(1) == 0L) 1L
            else math.max(1L, r.getLong(0))
    intervalOverlapJoin(left, leftStart, leftEnd,
      right, rightStart, rightEnd, w)
  }

  /** Inner point-in-interval join. `points`/`intervals` must already carry
    * distinct column names; every column of both survives on the output.
    * Bucket ids use integer `div` (NOT `floor(x / w)` — double division
    * loses exactness past 2⁵³, which epoch-nanos exceed); negative
    * values fail fast via [[guardedBucket]]. */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(expr(guardedBucket(startCol, bucketWidth)),
        expr(s"`$endCol` div $bucketWidth"))))
    val pt = points.withColumn("__bucket",
      expr(guardedBucket(pointCol, bucketWidth)))
    pt.join(iv.hint("shuffle_hash"), Seq("__bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: pairs where `[ls, le]` and `[rs, re]`
    * intersect (closed bounds). Both sides explode to their covered
    * buckets and equi-join; an overlapping pair shares EVERY bucket the
    * intersection spans, so emitting it once needs a tiebreak — the
    * canonical-bucket trick: the pair is kept only in the bucket holding
    * `max(ls, rs)`, the intersection's left edge. Exactly-once by
    * construction — no `dropDuplicates` shuffle after the join. */
  def intervalOverlapJoin(left: DataFrame, leftStart: String, leftEnd: String,
                          right: DataFrame, rightStart: String, rightEnd: String,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bucket",
        explode(sequence(expr(guardedBucket(s, bucketWidth)),
          expr(s"`$e` div $bucketWidth"))))
    buckets(left, leftStart, leftEnd)
      .join(buckets(right, rightStart, rightEnd).hint("shuffle_hash"),
        Seq("__bucket"))
      .where(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd) &&
        col("__bucket") === expr(
          s"greatest(`$leftStart`, `$rightStart`) div $bucketWidth"))
      .drop("__bucket")
  }
}
