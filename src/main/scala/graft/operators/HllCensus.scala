package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count census on DataSketches HLL sketches
  * (`hll_sketch_agg` / `hll_union_agg`, Spark's built-in Apache
  * DataSketches integration).
  *
  * The exact [[graft.api.IncrementalCensus]] answers "how many rows /
  * bytes changed" by folding edit-log deltas — additive metrics fold.
  * Distinct counts do NOT fold: `|A ∪ B| ≠ |A| + |B|`, so the exact
  * census must rescan raw rows for every distinct-users question at a
  * new grouping or date range. At 100 TB that rescan is the cost this
  * operator removes: build a per-segment sketch table ONCE (one
  * partial-aggregated pass over the raw rows — the sketch is the
  * aggregation state, so map-side combine applies and the shuffle
  * carries one ~KB sketch per (segment × partition)), persist it, and
  * answer any coarser-grained distinct question later by merging the
  * touched segments' sketches — O(segments × sketch bytes) input, raw
  * rows never read again. Re-aggregation, late-arriving appends, and
  * multi-granularity serving all reduce to sketch union, which is
  * associative, commutative, and idempotent-per-item.
  *
  * Accuracy contract: estimates are exact while a sketch is still in
  * the DataSketches sparse/coupon regime (≲4k distinct per merged
  * result at the default `lgK`=18 here) and ±~0.5% relative error
  * beyond it. The oracle-checked registry entry
  * (`events_distinct_sketch`) runs at gate scale inside the exact
  * regime — pinning the algebra bit-for-bit against DuckDB's
  * `COUNT(DISTINCT)` — while `ScaleBench` measures the error and the
  * input-records economics past it (2M distinct at 10M rows).
  *
  * Reference behavior this generalizes: the suggestions census counts
  * distinct users/directories per cycle with full scans
  * (`suggestionsengine/SuggestionsEngine.java` recomputes user sets
  * every 15-min cycle); a persisted sketch table answers the same
  * questions over ANY historical window without replaying history.
  */
object HllCensus {

  /** One pass over raw rows → per-segment sketch table
    * `(segCols..., sketch: binary)`. This is the only stage that reads
    * raw data; persist its output (plain parquet — the sketch is a
    * portable DataSketches byte image). `lgK` is the sketch precision
    * (2^lgK registers ≈ 256 KB dense at 18; sparse until ~4k items).
    */
  def build(df: DataFrame, segCols: Seq[Column], item: Column,
            lgK: Int = 18): DataFrame =
    df.groupBy(segCols: _*)
      .agg(hll_sketch_agg(item, lgK).as("sketch"))

  /** Answer a distinct-count question from the persisted sketch table:
    * regroup to any grouping coarser than (or equal to) the build
    * segmentation and union-merge. Input is sketch rows only. Multiple
    * sketch rows per segment (from incremental [[add]] batches) merge
    * transparently — union is idempotent per item, so re-delivered or
    * segment-overlapping batches can never overcount.
    */
  def estimate(sketches: DataFrame, groupCols: Seq[Column],
               as: String = "n_distinct"): DataFrame =
    sketches.groupBy(groupCols: _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as(as))

  /** Global (ungrouped) estimate over an already-filtered sketch set —
    * e.g. a date-range slice of the segment table. */
  def estimateAll(sketches: DataFrame,
                  as: String = "n_distinct"): DataFrame =
    sketches.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as(as))

  /** Incremental maintenance: sketch a NEW raw batch (O(batch) work)
    * and append its segment rows. No read-modify-write of existing
    * sketches — a segment that receives late data simply gains a
    * second sketch row, folded at [[estimate]] time. Compact with
    * [[compact]] when a segment's row count grows. */
  def add(sketches: DataFrame, newData: DataFrame, segCols: Seq[Column],
          item: Column, lgK: Int = 18): DataFrame =
    sketches.unionByName(build(newData, segCols, item, lgK))

  /** Rewrite the sketch table to one row per segment (merge the
    * append-run). Pure sketch-space work — raw rows are not touched. */
  def compact(sketches: DataFrame, segCols: Seq[Column]): DataFrame =
    sketches.groupBy(segCols: _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Set ALGEBRA over the sketch table: the overlap between each pair
    * of consecutive segments by inclusion–exclusion,
    * `|A ∩ B| = |A| + |B| − |A ∪ B|`, where the union estimate comes
    * from the scalar two-sketch `hll_union` — i.e. week-over-week
    * retention computed from persisted sketches with ZERO raw-row
    * input. The exact-path retention ([[Retention.cohorts]]) must
    * re-shuffle every (user, week) row for every question; this joins
    * a segments-sized table against itself (broadcastable at any
    * corpus size — the sketch table has one ~KB row per segment).
    * Exact in the sparse regime; ±~1% of the LARGER set beyond it, so
    * small intersections of huge sets lose relative precision — the
    * standard HLL inclusion–exclusion caveat, acceptable for retention
    * (intersections are a large fraction of the cohort).
    */
  def consecutiveOverlap(sketches: DataFrame, key: String): DataFrame = {
    // materialize the compacted table before self-joining: it is
    // segments-sized (~KB/row) so the checkpoint is cheap, while an
    // unmaterialized self-join would re-run the whole upstream build
    // lineage — including any raw-row scan feeding `sketches` — once
    // per side
    val one = compact(sketches, Seq(col(key))).localCheckpoint(true)
    val a = one.select(col(key).as(s"${key}_a"), col("sketch").as("sk_a"))
    val b = one.select(col(key).as(s"${key}_b"), col("sketch").as("sk_b"))
    a.join(b, col(s"${key}_b") === col(s"${key}_a") + 1)
      .select(col(s"${key}_a"), col(s"${key}_b"),
        hll_sketch_estimate(col("sk_a")).as("n_a"),
        hll_sketch_estimate(col("sk_b")).as("n_b"),
        (hll_sketch_estimate(col("sk_a")) +
          hll_sketch_estimate(col("sk_b")) -
          hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))))
          .as("n_retained"))
  }
}
