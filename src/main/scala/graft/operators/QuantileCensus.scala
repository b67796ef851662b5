package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.QuantileDigest._

/** Per-segment quantile census — [[HllCensus]]'s shape with GK quantile
  * digests ([[graft.functions.QuantileDigest]]) as the mergeable state:
  * build a digest table per segment in one partial-aggregated pass,
  * persist it (binary digest column in plain parquet), and serve
  * "p50/p99 over any coarser grouping or window" from digest rows alone.
  * Appends are pure segment-row adds folded by [[quantiles]]' re-merge;
  * [[compact]] bounds an append-run. The digest's `count` is exact; the
  * quantile values carry the GK ε-rank guarantee under any merge tree
  * (spec-pinned to 2εN under ~1,000-digest trees of several shapes).
  *
  * Size under repeated compaction: GK summaries are not fully
  * mergeable (Agarwal et al., "Mergeability of summaries", 2012) — a
  * digest merged from m inputs grows ~linearly in m instead of
  * re-compressing to O(1/ε), because merged entries carry accumulated
  * rank-uncertainty deltas that saturate the compression threshold.
  * Each [[compact]] still strictly bounds TABLE size (one row per
  * segment, total bytes never expand), but a segment compacted every
  * cycle for a long time accretes digest bytes with total appends —
  * which is why a digest-bearing serving table rides the same periodic
  * full-rebuild cadence as the suggestions census rebase: the rebuild
  * resets every segment to a fresh O(1/ε·log εN) digest. Between
  * rebuilds, `compact(trimEps = Some(ε'))` bounds image size
  * explicitly by re-compressing at a coarser ε' — the (ε + ε') rank
  * bound is the price, spec-pinned.
  */
object QuantileCensus {

  def build(df: DataFrame, segCols: Seq[Column], value: Column,
            relativeError: Double = 0.001): DataFrame =
    df.groupBy(segCols: _*)
      .agg(quantile_digest_agg(value, relativeError).as("digest"))

  /** Re-merge to a coarser grouping and answer the given fractions;
    * output columns: groupCols..., n (exact), p<frac*100> per fraction. */
  def quantiles(digests: DataFrame, groupCols: Seq[Column],
                fractions: Seq[Double]): DataFrame = {
    val merged = digests.groupBy(groupCols: _*)
      .agg(quantile_digest_merge_agg(col("digest")).as("digest"))
    val qCols = fractions.map(q =>
      quantile_digest_query(col("digest"), q)
        .as(s"p${math.round(q * 100)}"))
    merged.select((groupCols :+
      quantile_digest_count(col("digest")).as("n")) ++ qCols: _*)
  }

  def add(digests: DataFrame, newData: DataFrame, segCols: Seq[Column],
          value: Column, relativeError: Double = 0.001): DataFrame =
    digests.unionByName(build(newData, segCols, value, relativeError))

  /** One row per segment. `trimEps = Some(ε)` additionally re-compresses
    * each merged digest at the coarser ε
    * ([[graft.functions.QuantileDigest.quantile_digest_trim]]) — the
    * bounded-size escape from GK's merge accretion for segments
    * compacted every cycle, at the cost of the trimmed (ε_build +
    * ε_trim) rank bound. Default keeps the original contract. */
  def compact(digests: DataFrame, segCols: Seq[Column],
              trimEps: Option[Double] = None): DataFrame = {
    val merged = digests.groupBy(segCols: _*)
      .agg(quantile_digest_merge_agg(col("digest")).as("digest"))
    trimEps.fold(merged)(e =>
      merged.withColumn("digest", quantile_digest_trim(col("digest"), e)))
  }

  /** Per-image byte budget: `factor` × the size of a FRESH ε-digest
    * over the same count — a flat 24 B header allowance + entries ×
    * 24 B, with the GK entry bound (1/(2ε))·(log₂(2εN)+2) plus slack
    * for small counts. An image under the budget is healthy; one above
    * it has accreted merge entries past what a rebuild would hold. */
  private def overBudget(relativeError: Double, factor: Double): Column = {
    val entries = lit(1.0 / (2 * relativeError)) *
      (log2(greatest(lit(2 * relativeError) *
        quantile_digest_count(col("digest")).cast("double"), lit(2.0))) +
        lit(2.0)) + lit(16.0)
    length(col("digest")).cast("double") >
      lit(factor) * (lit(24.0) + lit(24.0) * entries)
  }

  /** The auto-trim trigger — [[graft.pipeline.Dedup.compactNeeded]]'s
    * twin for the one structure in the engine whose bytes grow with
    * merge HISTORY rather than data: true when any segment's digest
    * image has accreted past `factor` × the fresh-rebuild expectation
    * for its own count. One segment-table-sized aggregate; rides every
    * compaction cycle so the caller never has to know the trim cadence.
    * `relativeError` is the table's build ε (recorded in every image,
    * restated here because the expectation is a per-TABLE contract —
    * mixed trimmed/untrimmed rows measure against the tight ε, which
    * only errs toward trimming a coarse image again, a no-op in size). */
  def trimNeeded(digests: DataFrame, relativeError: Double,
                 factor: Double = 3.0): Boolean = {
    require(relativeError > 0 && relativeError < 1 && factor >= 1.0,
      "trimNeeded needs eps in (0,1) and factor >= 1")
    digests.where(overBudget(relativeError, factor)).limit(1).count() > 0L
  }

  /** [[compact]] with the trim policy wired in: segments whose merged
    * image stays within the byte budget keep their tight build-ε bound;
    * only accreted segments re-compress at the coarser `trimEps`
    * ((ε_build + ε_trim) rank bound, count still exact). The decision
    * is a per-row `when` inside the same projection — no second pass,
    * no driver round-trip — so a serving table compacted through THIS
    * door self-maintains: image bytes stay bounded over unboundedly
    * many append/compact cycles with no manual trim call and no
    * full-rebuild dependency (spec-pinned over 40 cycles).
    *
    * The trim is additionally guarded on the image's RECORDED ε: a row
    * previously trimmed at a coarser ε than this call's `trimEps`
    * cannot be tightened after the fact (the accumulated rank error is
    * already ≥ its recorded ε), so TIGHTENING the trim policy on an
    * existing table leaves such rows untouched — a policy change is a
    * no-op on history instead of a mid-query executor crash; only
    * rows whose recorded ε fits under the new policy keep trimming. */
  def compactSelfTrimming(digests: DataFrame, segCols: Seq[Column],
                          relativeError: Double, trimEps: Double,
                          factor: Double = 3.0): DataFrame = {
    require(trimEps >= relativeError,
      s"trimEps ($trimEps) must be coarser than the build eps " +
        s"($relativeError)")
    compact(digests, segCols).withColumn("digest",
      when(overBudget(relativeError, factor) &&
        quantile_digest_eps(col("digest")) <= lit(trimEps),
        quantile_digest_trim(col("digest"), trimEps))
        .otherwise(col("digest")))
  }
}
