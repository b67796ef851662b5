package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Fields
import graft.inodes.InodeView

/** The scheduled suggestions analysis (SURVEY §2.10,
  * `cache/SuggestionsEngine.reloadSuggestions`,
  * `SuggestionsEngine.java:136-689`): ~45 cached scalars and ~45 per-user
  * maps over the namespace snapshot.
  *
  * The reference issues one parallel scan per metric (~60 scans per cycle);
  * here the whole DAG is TWO aggregation passes — one over files, one over
  * dirs — with every metric a conditional aggregate, so a full cycle at
  * 100 TB costs two scans regardless of metric count. Per-user maps reuse
  * the same conditional aggregates with a groupBy(user).
  */
object Suggestions {

  private val KB = 1024L
  private val MB = KB * KB
  private val day = 86400000L

  /** File-census conditional columns, mirroring the reference's size classes
    * (`SuggestionsEngine.java:313-330,375-376`) and age variants
    * (`:208-270,332-364`). */
  private def fileMetrics(now: Long): Seq[org.apache.spark.sql.Column] = {
    val fs = col("fileSize")
    val old24h = col("modTime") >= lit(now - 24 * 3600000L) // modified in 24h
    val acc1y = col("accessTime") <= lit(now - 365 * day)
    val acc2y = col("accessTime") <= lit(now - 2 * 365 * day)
    def cnt(c: org.apache.spark.sql.Column, name: String) =
      sum(when(c, 1L).otherwise(0L)).as(name)
    Seq(
      count(lit(1)).as("numFiles"),
      cnt(fs === 0, "emptyFiles"),
      cnt(fs > 0 && fs <= KB, "tinyFiles"),
      cnt(fs > KB && fs <= MB, "smallFiles"),
      cnt(fs > MB && fs <= 128 * MB, "mediumFiles"),
      cnt(fs > 128 * MB, "largeFiles"),
      cnt(fs === 0 && old24h, "emptyFiles24h"),
      cnt(fs > 0 && fs <= KB && old24h, "tinyFiles24h"),
      cnt(fs > KB && fs <= MB && old24h, "smallFiles24h"),
      cnt(fs === 0 && acc1y, "emptyFiles1yr"),
      cnt(fs > 0 && fs <= KB && acc1y, "tinyFiles1yr"),
      cnt(acc1y, "oldFiles1yr"),
      cnt(acc2y, "oldFiles2yr"),
      sum(when(fs === 0, Fields.longField("memoryConsumed")).otherwise(0L))
        .as("emptyFilesMem"),
      sum(when(fs > 0 && fs <= KB, Fields.longField("diskspaceConsumed"))
        .otherwise(0L)).as("tinyFilesDs"),
      sum(when(fs > KB && fs <= MB, Fields.longField("diskspaceConsumed"))
        .otherwise(0L)).as("smallFilesDs"),
      sum(when(acc1y, Fields.longField("diskspaceConsumed")).otherwise(0L))
        .as("oldFiles1yrDs"),
      sum(fs).as("totalBytes"),
      sum(Fields.longField("diskspaceConsumed")).as("totalDiskspace"),
      sum(Fields.longField("memoryConsumed")).as("totalFileMem"),
      sum(col("numBlocks")).as("totalBlocks"))
  }

  private def dirMetrics: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).as("numDirs"),
    sum(when(col("dirNumChildren") === 0, 1L).otherwise(0L)).as("emptyDirs"),
    sum(when(col("hasQuota"), 1L).otherwise(0L)).as("quotaDirs"),
    sum(when(col("hasQuota") &&
      Fields.longField("nsQuotaRatioUsed") >= 85, 1L).otherwise(0L))
      .as("nsQuotaHighDirs"),
    sum(when(col("hasQuota") &&
      Fields.longField("dsQuotaRatioUsed") >= 85, 1L).otherwise(0L))
      .as("dsQuotaHighDirs"))

  /** File-census half of [[cachedValues]] — exposed separately because
    * every file metric is a LINEAR conditional aggregate, which is what
    * makes [[IncrementalCensus]] possible. */
  private[api] def fileValues(inodes: DataFrame, now: Long): DataFrame = {
    val fm = fileMetrics(now)
    inodes.where(col("isFile")).agg(fm.head, fm.tail: _*)
  }

  /** Dir-census half — NOT row-linear (emptyDirs/quota ratios derive
    * from children and subtree usage), so incremental cycles recompute
    * it from the dirs-only scan. */
  private[api] def dirValues(inodes: DataFrame): DataFrame = {
    val dm = dirMetrics
    inodes.where(!col("isFile")).agg(dm.head, dm.tail: _*)
  }

  /** System-wide scalar metrics: ONE pass over files + ONE over dirs. */
  def cachedValues(inodes: DataFrame, now: Long = InodeView.NowMs): DataFrame =
    fileValues(inodes, now).crossJoin(dirValues(inodes))

  /** Per-user metric map: same conditional aggregates, grouped by user. */
  def cachedUserMaps(inodes: DataFrame, now: Long = InodeView.NowMs): DataFrame = {
    val fm = fileMetrics(now)
    inodes.where(col("isFile"))
      .groupBy(col("user"))
      .agg(fm.head, fm.tail: _*)
  }

  /** Per-user quota analysis (`cache/CachedQuotas.analyze`,
    * `CachedQuotas.java:90-170`): per owner, assigned/used quota totals and
    * the count of dirs at ≥85% utilization. */
  def cachedUserQuotas(inodes: DataFrame): DataFrame = {
    val ratio = Fields.longField("nsQuotaRatioUsed")
    val dratio = Fields.longField("dsQuotaRatioUsed")
    inodes.where(!col("isFile") && col("hasQuota"))
      .groupBy(col("user"))
      .agg(
        count(lit(1)).as("quotaDirs"),
        sum(col("nsQuota")).as("nsQuotaAssigned"),
        sum(col("nsQuotaUsed")).as("nsQuotaUsed"),
        sum(col("dsQuota")).as("dsQuotaAssigned"),
        sum(col("dsQuotaUsed")).as("dsQuotaUsed"),
        sum(when(ratio >= 85, 1L).otherwise(0L)).as("nsQuotaHighDirs"),
        sum(when(dratio >= 85, 1L).otherwise(0L)).as("dsQuotaHighDirs"))
  }

  /** Top-K directories at a depth by file count and bytes
    * (`SuggestionsEngine.java:287-310`). A file's unique ancestor at
    * `depth` is a PREFIX of its own path, so the key is one
    * `substring_index` projection — no ancestor explode (which would
    * multiply pre-shuffle rows by the average path depth), one shuffle on
    * the dir key, top-k as TakeOrdered. Files at or above `depth` have no
    * such ancestor and are excluded by the depth guard. */
  def topDirectories(inodes: DataFrame, depth: Int, k: Int): DataFrame =
    inodes.where(col("isFile"))
      .where(size(split(col("path"), "/")) - 1 > depth)
      .groupBy(substring_index(col("path"), "/", depth + 1).as("path"))
      .agg(count(lit(1)).as("numFiles"),
        sum(Fields.longField("diskspaceConsumed")).as("diskspaceConsumed"))
      .orderBy(col("numFiles").desc, col("path").asc)
      .limit(k)

  /** File ages histogram by monthly buckets (`SuggestionsEngine.java:162-189`). */
  def fileAges(spark: SparkSession, inodes: DataFrame,
               now: Long = InodeView.NowMs): DataFrame =
    graft.engine.Histograms.zeroFillTime(spark,
      graft.engine.Histograms.histogram(
        inodes.where(col("isFile")),
        graft.engine.Histograms.timeBucket(col("accessTime"), "monthly", now),
        count(lit(1))),
      "monthly")
}
