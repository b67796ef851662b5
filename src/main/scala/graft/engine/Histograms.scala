package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.inodes.InodeView

/** Histogram grouping keys (bucketizers), 1-/2-level invokers, and post-ops
  * (HAVING / top-k / sort / zero-fill) — re-expressing the reference's
  * `HistogramInvoker`/`TimeHistogram`/`SpaceSizeHistogram`/
  * `MemorySizeHistogram` (see SURVEY.md §2.4–2.5).
  *
  * Every bucketizer is a static `when`-chain / arithmetic expression —
  * Catalyst-foldable, codegen'd, no UDF — so a grouped aggregation compiles
  * to scan → partial hash agg → exchange → final hash agg, the plan shape
  * that scales linearly with input on a real cluster.
  *
  * Bin-edge fidelity note (SURVEY §7.4.4): the reference resolves buckets by
  * iterating a `HashMap` of overlapping `LongRange`s, so values on exact bin
  * edges land in a hash-order-dependent bucket. We define the canonical
  * ascending first-match order (lowest matching bin wins), which is
  * deterministic and matches the reference everywhere except the ambiguous
  * edge duplicates (`SpaceSizeHistogram.java:55-56` `1 GB` vs `1 GB+`;
  * `MemorySizeHistogram.java:71` `768 B` vs `1 KB`).
  */
object Histograms {

  private val KB = 1024L
  private val MB = KB * KB
  private val GB = KB * MB
  private val DayMs = 86400000L

  /** `fileSize`/`diskspaceConsumed` byte bins (`SpaceSizeHistogram.java:44-58`). */
  val spaceBins: Seq[(String, Long)] = Seq(
    "0 B" -> 0L, "1 KB" -> KB, "1 MB" -> MB, "16 MB" -> 16 * MB,
    "64 MB" -> 64 * MB, "128 MB" -> 128 * MB, "256 MB" -> 256 * MB,
    "512 MB" -> 512 * MB, "1 GB" -> GB)
  val spaceOverflow = "1 GB+"

  /** `memoryConsumed` bins (`MemorySizeHistogram.java:42-80`). */
  val memoryBins: Seq[(String, Long)] = Seq(
    "256 B" -> 256L, "512 B" -> 512L, "768 B" -> 768L, "1 KB" -> KB,
    "2 KB" -> 2 * KB, "4 KB" -> 4 * KB, "8 KB" -> 8 * KB, "16 KB" -> 16 * KB,
    "32 KB" -> 32 * KB, "64 KB" -> 64 * KB)
  val memoryOverflow = "64 KB+"

  /** Upper-inclusive ascending bin chain: value ≤ bound → label. */
  private def binChain(c: Column, bins: Seq[(String, Long)], overflow: String): Column =
    bins.reverse.foldLeft(lit(overflow)) { case (acc, (label, bound)) =>
      when(c <= bound, lit(label)).otherwise(acc)
    }

  def spaceBucket(c: Column): Column = binChain(c, spaceBins, spaceOverflow)
  def memoryBucket(c: Column): Column = binChain(c, memoryBins, memoryOverflow)

  /** Age bins for accessTime/modTime (`TimeHistogram.java:65-103`): age =
    * now − t, binned per `timeRange`; labels `"3 Weeks"`, overflow
    * `"49 Weeks+"`. First bin starts at 0 (`TimeHistogram.java:109-112`). */
  def timeBins(timeRange: String): (Seq[(String, Long)], String) = timeRange match {
    case "daily"   => ((1L until 365L).map(d => s"$d Days" -> d * DayMs), "364 Days+")
    case "weekly"  => ((1L until 50L).map(w => s"$w Weeks" -> w * 7 * DayMs), "49 Weeks+")
    case "monthly" => ((1L until 24L).map(m => s"$m Months" -> m * 30 * DayMs), "23 Months+")
    case "yearly"  => ((1L until 5L).map(y => s"$y Years" -> y * 365 * DayMs), "4 Years+")
    case other     => throw new IllegalArgumentException(s"unknown timeRange: $other")
  }

  def timeBucket(epochMs: Column, timeRange: String, now: Long = InodeView.NowMs): Column = {
    // time bins are UNIFORM, so the bucket index is arithmetic — a 365-deep
    // when-chain would blow codegen/analysis recursion for `daily` and is
    // O(bins) per row; this is O(1). Bin k covers [(k−1)·w+1, k·w] with bin 1
    // starting at 0 (`TimeHistogram.java:105-199`): idx = ceil(age/w), min 1.
    val (unitMs, nBins, unitName, overflow) = timeRange match {
      case "daily"   => (86400000L, 364, "Days", "364 Days+")
      case "weekly"  => (7 * 86400000L, 49, "Weeks", "49 Weeks+")
      case "monthly" => (30 * 86400000L, 23, "Months", "23 Months+")
      case "yearly"  => (365 * 86400000L, 4, "Years", "4 Years+")
      case other     => throw new IllegalArgumentException(s"unknown timeRange: $other")
    }
    val age = lit(now) - epochMs
    // doubles are exact here (ages ≪ 2^53)
    val idx = greatest(floor((age + (unitMs - 1)) / lit(unitMs.toDouble)).cast("long"), lit(1L))
    when(age < 0, lit("NO_MAPPING"))
      .when(idx <= nBins, concat(idx.cast("string"), lit(s" $unitName")))
      .otherwise(lit(overflow))
  }

  /** Bin labels in canonical order (for zero-fill / key ordering,
    * `Histograms.orderByKeyOrder` in the reference). */
  def timeKeys(timeRange: String): Seq[String] = {
    val (bins, overflow) = timeBins(timeRange)
    bins.map(_._1) :+ overflow
  }

  /** `parentDir` key: ancestor directory at the requested depth
    * (`Helper.java:288-304`); `NO_MAPPING` when the inode is shallower —
    * those rows are dropped by the invoker (`HistogramInvoker.java:165-167`). */
  def parentDirAtDepth(path: Column, depth: Int): Column = {
    // path "/a/b/c/f" → dir at depth 1 = "/a", depth 2 = "/a/b", …
    val prefix = substring_index(path, "/", depth + 1)
    // an inode at depth d has a parent chain of d-1 dirs; require enough depth
    when(size(split(path, "/")) - lit(2) >= depth && depth >= 1, prefix)
      .otherwise(lit("NO_MAPPING"))
  }

  /** Resolve a histogram `type` to its grouping key Column. */
  def keyFor(histType: String, timeRange: String = "weekly",
             parentDirDepth: Int = 0, now: Long = InodeView.NowMs): Column =
    histType match {
      case "user" | "group" | "name" | "path" => col(histType)
      case "accessTime" | "modTime" => timeBucket(col(histType), timeRange, now)
      case "fileSize" => spaceBucket(col("fileSize"))
      case "diskspaceConsumed" => spaceBucket(Fields.longField("diskspaceConsumed"))
      case "memoryConsumed" => memoryBucket(Fields.longField("memoryConsumed"))
      case "fileReplica" => replicaKey(ecAware = false)
      case "storageType" => Fields.stringField("storageType")
      case "fileType" => FileTypes.classify(col("name"))
      case "parentDir" => parentDirAtDepth(col("path"), parentDirDepth)
      case "dirQuota" => col("path")
      case "modDate" | "accessDate" => Fields.stringField(histType)
      case other => throw new IllegalArgumentException(s"unknown histogram type: $other")
    }

  /** `fileReplica` grouping key. With `ecAware` (Hadoop 3.x semantics,
    * `VersionContext.java:206-219`, SURVEY §7.4.9) erasure-coded files
    * group under an EC label instead of their replication factor; behind a
    * flag because the fixture has no EC files. */
  def replicaKey(ecAware: Boolean): Column =
    if (ecAware)
      when(col("hasEcPolicy"), lit("EC")).otherwise(col("fileReplica").cast("string"))
    else col("fileReplica").cast("string")

  /** Hadoop's built-in erasure-coding policies, id → name (public
    * `SystemErasureCodingPolicies`; the reference renders the policy NAME
    * in its replica histogram, `VersionContext.java:206-219`). */
  val EcPolicyNames: Seq[(Long, String)] = Seq(
    1L -> "RS-6-3-1024k", 2L -> "RS-3-2-1024k", 3L -> "RS-LEGACY-6-3-1024k",
    4L -> "XOR-2-1-1024k", 5L -> "RS-10-4-1024k")

  /** EC-aware replica key grouping EC files by their policy NAME — usable
    * on full-fidelity ingested namespaces (`oivxml:`/`oivbin:` recover
    * `ecPolicyId`). Unknown ids render as `EC-<id>` rather than hiding. */
  def replicaEcNameKey(policyId: Column): Column = {
    val named = EcPolicyNames.foldLeft(
      concat(lit("EC-"), policyId.cast("string"))) { case (acc, (id, nm)) =>
      when(policyId === id, nm).otherwise(acc)
    }
    when(col("hasEcPolicy"), named).otherwise(col("fileReplica").cast("string"))
  }

  /** Value expression for sum=X (grouped), `AbstractQueryEngine.java:956-963`. */
  def sumAgg(sumField: String): Column = sumField match {
    case "count" => count(lit(1))
    case f       => sum(Fields.longField(f))
  }

  /** Value expression for find=min|max|avg:X per group
    * (`AbstractQueryEngine.java:993-1077`; avg truncated to long). */
  def findAgg(findOp: String, findField: String): Column = findOp match {
    case "min" => min(Fields.longField(findField))
    case "max" => max(Fields.longField(findField))
    case "avg" => floor(avg(Fields.longField(findField))).cast("long")
    case other => throw new IllegalArgumentException(s"unknown find op: $other")
  }

  /** One-level histogram: filtered set → (key, value).
    *
    * Skew: when `graft.skew.salts` is set (> 1) and the aggregate is
    * algebraic (count/sum — partials recombine by summing), the group-by
    * runs two-phase salted via [[Skew]]: phase 1 spreads a hot key over
    * `salts` reducers, phase 2 sums the partials. Spark has no pre-runtime
    * group-by-skew statistics (AQE only re-plans skewed JOINS), so the gate
    * is an operator-level setting rather than a guess; uniform data pays
    * one cheap `salts`-way-smaller extra stage. */
  def histogram(df: DataFrame, key: Column, value: Column,
                dropNoMapping: Boolean = false): DataFrame = {
    val salts = df.sparkSession.conf.get("graft.skew.salts", "0").toInt
    val h =
      if (salts > 1 && isAlgebraic(value))
        df.withColumn("__salt", Skew.rowSalt(df, salts))
          .groupBy(key.as("key"), col("__salt"))
          .agg(value.as("__partial"))
          .groupBy(col("key")).agg(sum(col("__partial")).as("value"))
      else df.groupBy(key.as("key")).agg(value.as("value"))
    if (dropNoMapping) h.where(col("key") =!= "NO_MAPPING") else h
  }

  /** Count and Sum partials recombine losslessly by summing — but ONLY the
    * non-DISTINCT forms: count(DISTINCT x) partials per salt bucket would
    * double-count values appearing in several buckets, so distinct
    * aggregates refuse the salted path. (Spark 4's functions API builds
    * connect-style nodes, so name + distinct flag are read at the
    * Column-node layer, pre-analysis.) */
  private def isAlgebraic(value: Column): Boolean =
    org.apache.spark.sql.GraftColumnBridge.functionNameDistinct(value)
      .exists { case (n, isDistinct) =>
        !isDistinct &&
          (n.equalsIgnoreCase("count") || n.equalsIgnoreCase("sum"))
      }

  /** Two-level histogram (`AbstractQueryEngine.java:934-945`). */
  def histogram2(df: DataFrame, key1: Column, key2: Column, value: Column): DataFrame =
    df.groupBy(key1.as("key1"), key2.as("key2")).agg(value.as("value"))

  /** Wide-format two-level histogram: key2 values pivoted to columns
    * (the columnar render of the reference's nested-map output). Pass the
    * expected key2 domain for a deterministic, shuffle-free-pivot plan. */
  def histogram2Pivot(df: DataFrame, key1: Column, key2: Column,
                      value: Column, key2Values: Seq[String]): DataFrame =
    df.groupBy(key1.as("key"))
      .pivot(key2.as("key2"), key2Values)
      .agg(value)
      .na.fill(0L)

  /** Multi-sum histogram (`/histogram3`): one pass, several aggregates —
    * an improvement over the reference, which re-scans once per sum
    * (`NamenodeAnalyticsMethods.java:1872-1944`). */
  def histogramMulti(df: DataFrame, key: Column, sums: Seq[String]): DataFrame =
    df.groupBy(key.as("key")).agg(sumAgg(sums.head).as(sums.head),
      sums.tail.map(s => sumAgg(s).as(s)): _*)

  /** HAVING over bucket values (`histogramConditions`,
    * `AbstractQueryEngine.java:794-884`): comma-list of `op:val`, AND-only. */
  def havingCondition(conditions: String, valueCol: Column): Column =
    conditions.split(',').map { c =>
      val Array(op, v) = c.split(':')
      op match {
        case "eq" => valueCol === v.toLong
        case "neq" | "notEq" => valueCol =!= v.toLong
        case "lt" => valueCol < v.toLong
        case "lte" => valueCol <= v.toLong
        case "gt" => valueCol > v.toLong
        case "gte" => valueCol >= v.toLong
        case other => throw new IllegalArgumentException(s"bad having op: $other")
      }
    }.reduce(_ && _)

  /** Top-K buckets by value, deterministic tiebreak on key
    * (`Histograms.java:193-217`). */
  def topK(h: DataFrame, k: Int): DataFrame =
    h.orderBy(col("value").desc, col("key").asc).limit(k)

  def bottomK(h: DataFrame, k: Int): DataFrame =
    h.orderBy(col("value").asc, col("key").asc).limit(k)

  /** Zero-fill + canonical key order for time histograms
    * (`Histograms.orderByKeyOrder:226-232`): join with the static bin table,
    * missing bins → 0. The bin table is a literal — broadcast by Catalyst. */
  def zeroFillTime(spark: org.apache.spark.sql.SparkSession, h: DataFrame,
                   timeRange: String): DataFrame = {
    import spark.implicits._
    val keys = timeKeys(timeRange).zipWithIndex.toDF("key", "ord")
    keys.join(h, Seq("key"), "left")
      .select(col("key"), coalesce(col("value"), lit(0L)).as("value"), col("ord"))
      .orderBy("ord").drop("ord")
  }
}
