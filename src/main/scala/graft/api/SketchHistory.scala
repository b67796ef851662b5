package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.QuantileDigest._

/** Sketch-bearing history: one row per census cycle carrying an HLL
  * sketch of the active owners and a GK digest of the file-size
  * distribution, alongside the exact scalars.
  *
  * The plain history sink ([[Sinks.appendHistory]], the reference's
  * history-DB shape — `HSQLDriver.logHistoryPerUser` stores per-user
  * aggregate rows per cycle) can trend any ADDITIVE metric, but two
  * everyday questions are unanswerable from it even in principle once
  * the snapshot is replaced: "how many DISTINCT owners were active over
  * the last quarter" (distinct doesn't fold across cycle rows) and "how
  * did the p99 file size move" (percentiles don't fold either, and the
  * old namespaces no longer exist to rescan). One sketch row per cycle
  * — ~KBs — makes both servable forever: window distinct = HLL union
  * over the window's rows, per-cycle or windowed percentiles = digest
  * re-merge, all O(cycles) with the raw namespaces long gone.
  */
object SketchHistory {

  /** The per-cycle sketch row: computed in the same pass discipline as
    * the suggestions census (one aggregate over the files view). */
  def cycleRow(files: DataFrame): DataFrame =
    files.agg(
      count(lit(1)).as("n_files"),
      sum(col("fileSize").cast("decimal(38,0)")).cast("long").as("bytes"),
      hll_sketch_agg(col("user"), 18).as("users_sketch"),
      quantile_digest_agg(col("fileSize").cast("double"), 0.001)
        .as("size_digest"))

  def append(files: DataFrame, historyPath: String,
             cycleTimestampMs: Long): Unit =
    cycleRow(files)
      .withColumn("cycle_ts", lit(cycleTimestampMs))
      .write.mode(SaveMode.Append).parquet(historyPath)

  def read(spark: SparkSession, historyPath: String): DataFrame =
    spark.read.parquet(historyPath)

  /** Distinct owners active at ANY point in [fromTs, toTs] — a union of
    * the window's cycle sketches. Exact in the sparse regime; the thing
    * the exact history cannot answer at all. */
  def distinctUsersOver(hist: DataFrame, fromTs: Long,
                        toTs: Long): DataFrame =
    hist.where(col("cycle_ts").between(fromTs, toTs))
      .agg(hll_sketch_estimate(hll_union_agg(col("users_sketch")))
        .as("n_users"))

  /** Per-cycle size percentiles served from the stored digests — the
    * raw namespaces behind old cycles need not exist anymore. */
  def sizePercentiles(hist: DataFrame,
                      fractions: Seq[Double] = Seq(0.5, 0.95, 0.99))
      : DataFrame = {
    val qCols = fractions.map(q =>
      quantile_digest_query(col("size_digest"), q)
        .as(s"p${math.round(q * 100)}"))
    hist.select(col("cycle_ts") +: col("n_files") +: qCols: _*)
      .orderBy("cycle_ts")
  }

  /** One digest for the whole window (e.g. "p99 across the quarter"). */
  def sizePercentilesOver(hist: DataFrame, fromTs: Long, toTs: Long,
                          fractions: Seq[Double] = Seq(0.5, 0.99))
      : DataFrame = {
    val merged = hist.where(col("cycle_ts").between(fromTs, toTs))
      .agg(quantile_digest_merge_agg(col("size_digest")).as("d"))
    val qCols = fractions.map(q =>
      quantile_digest_query(col("d"), q).as(s"p${math.round(q * 100)}"))
    merged.select(quantile_digest_count(col("d")).as("n") +: qCols: _*)
  }
}
