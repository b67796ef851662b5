package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._
import graft.inodes.InodeView
import graft.inodes.InodeView.{NowMs, oracle}

/** The NNA operator inventory (SURVEY.md §2) as named queries, each paired
  * with a DuckDB oracle statement over the same parquet input (via
  * [[InodeView.oracleCte]]). Query names are stable keys consumed by
  * `SparkEntry.queries` / `SparkEntry.oracleSql`.
  *
  * Convention: every output column is aliased identically in the DataFrame
  * plan and the SQL; aggregates are integer-exact (counts, long sums, floored
  * ratios in ppm) so the hash compare is bit-stable across engines.
  */
object NNAQueries {

  type Q = (SparkSession, String) => DataFrame

  private def inodes(spark: SparkSession, dir: String): DataFrame =
    InodeView.snapshot(spark, dir)
  private def files(spark: SparkSession, dir: String): DataFrame =
    inodes(spark, dir).where(col("isFile"))
  private def dirsOf(spark: SparkSession, dir: String): DataFrame =
    inodes(spark, dir).where(!col("isFile"))

  private val dayMs = 86400000L

  val queries: Map[String, Q] = Map(
    // F1/F3/F4: AND-chain of long predicates + A1 count
    "nna_filter_count" -> ((s, d) =>
      files(s, d).where(Filters.compileAll("fileSize:eq:0", "files"))
        .agg(count(lit(1)).as("cnt"))),

    // F4 long ops + A3 multi-sum in one pass
    "nna_filter_multi" -> ((s, d) =>
      files(s, d)
        .where(Filters.compileAll("fileSize:gte:1048576,numBlocks:lt:3,fileReplica:gt:2", "files"))
        .agg(count(lit(1)).as("cnt"),
          sum(Fields.longField("diskspaceConsumed")).as("diskspaceConsumed"),
          sum(Fields.longField("numReplicas")).as("numReplicas"))),

    // F6 string ops
    "nna_filter_string" -> ((s, d) =>
      files(s, d)
        .where(Filters.compileAll("name:endsWith:.parquet,path:notStartsWith:/A,path:contains:/d4", "files"))
        .agg(count(lit(1)).as("cnt"))),

    // F8 boolean ops
    "nna_filter_bool" -> ((s, d) =>
      files(s, d)
        .where(Filters.compileAll("isWithSnapshot:eq:true,hasAcl:notEq:true", "files"))
        .agg(count(lit(1)).as("cnt"))),

    // F7 date-string ops (dateGte on MM/dd/yyyy render)
    "nna_filter_date" -> ((s, d) =>
      files(s, d)
        .where(Filters.compileAll("modDate:dateGte:07/01/2024", "files"))
        .agg(count(lit(1)).as("cnt"))),

    // F5 relative-time ops with explicit now
    "nna_filter_time_ago" -> ((s, d) =>
      files(s, d)
        .where(Filters.compileAll("modTime:daysAgo:90", "files"))
        .agg(count(lit(1)).as("cnt"), sum(col("fileSize")).as("fileSize"))),

    // F5 olderThan + permission/depth derived fields
    "nna_filter_older_perm" -> ((s, d) =>
      files(s, d)
        .where(Filters.compileAll("accessTime:olderThanYears:1,permission:eq:755,depth:eq:4", "files"))
        .agg(count(lit(1)).as("cnt"))),

    // S6 path-dump sink: sorted paths with limit
    "nna_dump_paths" -> ((s, d) =>
      files(s, d)
        .where(Filters.compileAll("user:eq:u1,fileSize:gt:0", "files"))
        .select(col("path")).orderBy("path").limit(50)),

    // A4 global find max (arg-max inode)
    "nna_find_global_max" -> ((s, d) =>
      files(s, d).orderBy(col("fileSize").desc, col("id").asc).limit(1)
        .select(col("path"), col("fileSize").as("value"))),

    // A1/A2: the full 7-sum file aggregate in one pass
    "nna_sum_all_fields" -> ((s, d) =>
      files(s, d).agg(
        count(lit(1)).as("cnt"),
        sum(col("fileSize")).as("fileSize"),
        sum(Fields.longField("diskspaceConsumed")).as("diskspaceConsumed"),
        sum(col("blockSize")).as("blockSize"),
        sum(col("numBlocks")).as("numBlocks"),
        sum(Fields.longField("numReplicas")).as("numReplicas"),
        sum(Fields.longField("memoryConsumed")).as("memoryConsumed"))),

    // A2 quota-family sums over dirs
    "nna_sum_quota" -> ((s, d) =>
      dirsOf(s, d).where(Filters.compileAll("hasQuota:eq:true", "dirs"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("nsQuota")).as("nsQuota"),
          sum(col("nsQuotaUsed")).as("nsQuotaUsed"),
          sum(col("dsQuotaUsed")).as("dsQuotaUsed"),
          sum(Fields.longField("nsQuotaRatioUsed")).as("nsQuotaRatioUsed"))),

    // A5 one-level histogram: user → count
    "nna_histogram_user" -> ((s, d) =>
      Histograms.histogram(files(s, d), col("user"), count(lit(1)))),

    // A5 via the two-phase salted path (hot-key mitigation): identical
    // results to nna_histogram_user — same oracle — and a standing bench
    // row measuring the salting overhead on uniform data
    "nna_histogram_user_salted" -> ((s, d) => {
      s.conf.set("graft.skew.salts", "8")
      try Histograms.histogram(files(s, d), col("user"), count(lit(1)))
      finally s.conf.set("graft.skew.salts", "0")
    }),

    // A5 over `all` set with sum=diskspaceConsumed
    "nna_histogram_group_ds" -> ((s, d) =>
      Histograms.histogram(inodes(s, d), col("group"),
        sum(Fields.longField("diskspaceConsumed")))),

    // A6/A7 grouped min/max/avg (avg truncated like the reference)
    "nna_histogram_find" -> ((s, d) =>
      files(s, d).groupBy(col("user").as("key")).agg(
        Histograms.findAgg("min", "fileSize").as("minv"),
        Histograms.findAgg("max", "fileSize").as("maxv"),
        Histograms.findAgg("avg", "fileSize").as("avgv"))),

    // A8 two-level histogram: user × storage policy name
    "nna_histogram2" -> ((s, d) =>
      Histograms.histogram2(files(s, d), col("user"),
        Fields.stringField("storageType"), count(lit(1)))),

    // A3 multi-sum histogram (/histogram3) — one pass, several aggregates
    "nna_histogram_multisum" -> ((s, d) =>
      files(s, d).groupBy(col("user").as("key")).agg(
        count(lit(1)).as("cnt"),
        sum(col("fileSize")).as("fileSize"),
        sum(Fields.longField("diskspaceConsumed")).as("diskspaceConsumed"))),

    // §2.4 space-size bucketizer
    "nna_histogram_filesize_bins" -> ((s, d) =>
      Histograms.histogram(files(s, d), Histograms.spaceBucket(col("fileSize")),
        count(lit(1)))),

    // §2.4 memory bucketizer over `all`
    "nna_histogram_memory_bins" -> ((s, d) =>
      Histograms.histogram(inodes(s, d),
        Histograms.memoryBucket(Fields.longField("memoryConsumed")),
        count(lit(1)))),

    // §2.4 time-age bucketizer (monthly), zero-filled in canonical order
    "nna_histogram_time_monthly" -> ((s, d) =>
      Histograms.zeroFillTime(s,
        Histograms.histogram(files(s, d),
          Histograms.timeBucket(col("modTime"), "monthly"), count(lit(1))),
        "monthly")),

    // §2.4 time-age yearly over accessTime
    "nna_histogram_time_yearly" -> ((s, d) =>
      Histograms.zeroFillTime(s,
        Histograms.histogram(files(s, d),
          Histograms.timeBucket(col("accessTime"), "yearly"), count(lit(1))),
        "yearly")),

    // §2.4 modDate day-string grouping
    "nna_histogram_moddate" -> ((s, d) =>
      Histograms.histogram(files(s, d), Fields.stringField("modDate"),
        count(lit(1)))),

    // §2.4 fileType classifier grouping
    "nna_histogram_filetype" -> ((s, d) =>
      Histograms.histogram(files(s, d), FileTypes.classify(col("name")),
        count(lit(1)))),

    // §2.4 storage-policy grouping
    "nna_histogram_storage" -> ((s, d) =>
      Histograms.histogram(files(s, d), Fields.stringField("storageType"),
        count(lit(1)))),

    // §2.4 fileReplica grouping
    "nna_histogram_replica" -> ((s, d) =>
      Histograms.histogram(files(s, d), col("fileReplica").cast("string"),
        count(lit(1)))),

    // §2.4 parentDir at depth 2
    "nna_histogram_parentdir" -> ((s, d) =>
      Histograms.histogram(files(s, d),
        Histograms.parentDirAtDepth(col("path"), 2), sum(col("fileSize")),
        dropNoMapping = true)),

    // §2.4 dirQuota histogram (ns ratio per quota dir, >0 kept)
    "nna_histogram_dirquota" -> ((s, d) =>
      Histograms.histogram(
        dirsOf(s, d).where(col("hasQuota")), col("path"),
        sum(Fields.longField("nsQuotaRatioUsed")))
        .where(col("value") > 0)),

    // P1 histogramConditions (HAVING)
    "nna_having" -> ((s, d) =>
      Histograms.histogram(files(s, d), col("user"), count(lit(1)))
        .where(Histograms.havingCondition("gt:100", col("value")))),

    // P2/P3 top-k by value
    "nna_topk" -> ((s, d) =>
      Histograms.topK(
        Histograms.histogram(files(s, d), col("user"),
          sum(Fields.longField("diskspaceConsumed"))), 5)),

    "nna_bottomk" -> ((s, d) =>
      Histograms.bottomK(
        Histograms.histogram(files(s, d), col("user"), count(lit(1))), 3)),

    // grouped top-k: the per-key variant of P2 (reference top-K is global
    // over the histogram) — largest files per user. One shuffle on the
    // group key; rank + filter prune inside the sorted partition, so only
    // k rows per key survive the exchange downstream.
    "nna_topk_per_user" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user"))
        .orderBy(col("fileSize").desc, col("path").asc)
      files(s, d).select(col("user"), col("path"), col("fileSize"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
    }),

    // A10 /divide: tiny-file ratio in ppm
    "nna_divide" -> ((s, d) => {
      val f = files(s, d)
      Aggregates.divide(
        f.where(col("fileSize") > 0 && col("fileSize") <= 1024), count(lit(1)),
        f, count(lit(1)))
    }),

    // A11 contentSummary under /R/F
    "nna_content_summary" -> ((s, d) =>
      Aggregates.contentSummary(inodes(s, d), "/R/F")),

    // §7.4.1 quota ancestry: files under any nsQuota dir
    "nna_under_ns_quota" -> ((s, d) =>
      PathStructure.underQuota(inodes(s, d), "nsQuota")
        .where(col("isFile")).agg(count(lit(1)).as("cnt"))),

    // §7.4.2 subtree aggregation for shallow dirs (one shuffle for all dirs)
    "nna_dir_subtree" -> ((s, d) => {
      // depth-bounded report: prune the ancestor explode to depth ≤ 2
      // BEFORE the shuffle (the join would drop deeper rows anyway —
      // after paying to aggregate them)
      val stats = PathStructure.subtreeStats(inodes(s, d), maxDepth = 2)
      dirsOf(s, d).where(col("depth") <= 2).select(col("path"))
        .join(stats, Seq("path"), "inner")
        .orderBy("path")
    }),

    // §2.6 what-if transform: replica := 2 under /A, then sum diskspace
    "nna_transform" -> ((s, d) => {
      val tf = Transforms.transformedField("path:startsWith:/A", "files", 2L)
      files(s, d).agg(
        sum(tf("diskspaceConsumed")).as("diskspaceConsumed"),
        sum(tf("numReplicas")).as("numReplicas"))
    }),

    // §2.7 SQL surface: Spark SQL over registered files/dirs views
    "nna_sql" -> ((s, d) => {
      SqlShim.register(s, d)
      s.sql("SELECT `user` AS key, SUM(fileSize) AS value FROM files " +
        "WHERE fileSize > 0 GROUP BY `user`")
    }),

    // §2.10 suggestions scalars: file-size-class census in one pass
    "nna_suggestions_core" -> ((s, d) =>
      inodes(s, d).agg(
        sum(when(col("isFile") && col("fileSize") === 0, 1L).otherwise(0L)).as("emptyFiles"),
        sum(when(col("isFile") && col("fileSize") > 0 && col("fileSize") <= 1024, 1L).otherwise(0L)).as("tinyFiles"),
        sum(when(col("isFile") && col("fileSize") > 1024 && col("fileSize") <= 1048576, 1L).otherwise(0L)).as("smallFiles"),
        sum(when(col("isFile") && col("fileSize") > 1048576 && col("fileSize") <= 134217728, 1L).otherwise(0L)).as("mediumFiles"),
        sum(when(col("isFile") && col("fileSize") > 134217728, 1L).otherwise(0L)).as("largeFiles"),
        sum(when(!col("isFile") && col("dirNumChildren") === 0, 1L).otherwise(0L)).as("emptyDirs"))),

    // §2.10 per-user suggestion maps
    "nna_suggestions_peruser" -> ((s, d) =>
      files(s, d).groupBy(col("user").as("key")).agg(
        sum(when(col("fileSize") === 0, 1L).otherwise(0L)).as("emptyFiles"),
        sum(when(col("fileSize") > 0 && col("fileSize") <= 1024, 1L).otherwise(0L)).as("tinyFiles"),
        sum(when(col("accessTime") <= lit(NowMs - 365L * dayMs), 1L).otherwise(0L)).as("oldFiles1yr"))),

    // ---- the top-level NNAQuery API (endpoint-semantics entry point) ----

    // /filter with filters + multi-sum through the API
    "nna_api_filter" -> ((s, d) =>
      graft.api.NNAQuery.execute(
        graft.api.NNAQuery(set = "files", filters = "fileSize:gt:0,fileReplica:gte:3",
          sum = Seq("count", "fileSize", "diskspaceConsumed")),
        inodes(s, d))),

    // /histogram2 user × fileType through the API
    "nna_api_histogram2" -> ((s, d) =>
      graft.api.NNAQuery.execute(
        graft.api.NNAQuery(set = "files", histType = Some("user"),
          histType2 = Some("fileType"), sum = Seq("count")),
        inodes(s, d))),

    // /histogram weekly age buckets + having + sort through the API
    "nna_api_weekly_having" -> ((s, d) =>
      graft.api.NNAQuery.execute(
        graft.api.NNAQuery(set = "files", histType = Some("modTime"),
          timeRange = "weekly", sum = Seq("count"),
          histogramConditions = "gt:50", sortAscending = Some(false)),
        inodes(s, d))),

    // /histogram with what-if transform through the API: diskspace per user
    // if everything under /N had replication 1
    "nna_api_transform_hist" -> ((s, d) =>
      graft.api.NNAQuery.execute(
        graft.api.NNAQuery(set = "files", histType = Some("user"),
          sum = Seq("diskspaceConsumed"),
          transformConditions = "path:startsWith:/N",
          transformReplica = Some(1L)),
        inodes(s, d))),

    // /divide through the API: snapshot-flagged ratio
    "nna_api_divide" -> ((s, d) =>
      graft.api.NNAQuery.divide(
        graft.api.NNAQuery(set = "files", filters = "isWithSnapshot:eq:true",
          sum = Seq("count")),
        graft.api.NNAQuery(set = "files", sum = Seq("count")),
        inodes(s, d))),

    // §2.10 suggestions DAG: whole-namespace census in two passes
    "nna_suggestions_values" -> ((s, d) =>
      graft.api.Suggestions.cachedValues(inodes(s, d))),

    // §2.10 top directories at depth 2 by file count
    "nna_top_directories" -> ((s, d) =>
      graft.api.Suggestions.topDirectories(inodes(s, d), 2, 5)),

    // §2.4 daily age bucketizer (365 bins + overflow; no zero-fill)
    "nna_histogram_time_daily" -> ((s, d) =>
      Histograms.histogram(files(s, d),
        Histograms.timeBucket(col("modTime"), "daily"), count(lit(1)))),

    // §2.4 diskspaceConsumed-keyed space bins with sum=count
    "nna_histogram_diskspace_bins" -> ((s, d) =>
      Histograms.histogram(files(s, d),
        Histograms.spaceBucket(Fields.longField("diskspaceConsumed")),
        count(lit(1)))),

    // §2.4 accessDate day-string grouping over all
    "nna_histogram_accessdate" -> ((s, d) =>
      Histograms.histogram(inodes(s, d), Fields.stringField("accessDate"),
        count(lit(1)))),

    // F-matrix join-backed filters: subtree-stat predicate on dirs
    "nna_filter_subtree" -> ((s, d) =>
      graft.api.NNAQuery.execute(
        graft.api.NNAQuery(set = "dirs",
          filters = "dirSubTreeNumFiles:gte:100,depth:lte:3",
          sum = Seq("count", "dirNumChildren")),
        inodes(s, d))),

    // F-matrix join-backed filters: quota-ancestry flag through the API
    "nna_filter_under_quota" -> ((s, d) =>
      graft.api.NNAQuery.execute(
        graft.api.NNAQuery(set = "files",
          filters = "isUnderNsQuota:eq:true,fileSize:gt:0",
          sum = Seq("count")),
        inodes(s, d))),

    // §2.10 per-user quota analysis (CachedQuotas)
    "nna_user_quotas" -> ((s, d) =>
      graft.api.Suggestions.cachedUserQuotas(inodes(s, d))),

    // A8 wide render: storage-policy counts pivoted to columns per user
    "nna_histogram2_pivot" -> ((s, d) =>
      Histograms.histogram2Pivot(files(s, d), col("user"),
        Fields.stringField("storageType"), count(lit(1)),
        InodeView.StoragePolicies.map(_._2) :+ "NO_MAPPING")),

    // A6/A9: grouped find=avg over the `all` set (memoryConsumed is one of
    // the few all-set find fields in the matrix)
    "nna_histogram_find_all" -> ((s, d) =>
      graft.api.NNAQuery.execute(
        graft.api.NNAQuery(set = "all", histType = Some("group"),
          find = Some(("avg", "memoryConsumed"))),
        inodes(s, d))),

    // size-distribution percentiles (capacity-planning census; the exact
    // `percentile` here is the verifiable twin of approx_percentile, the
    // sketch production uses at namespace scale)
    "nna_size_percentiles" -> ((s, d) =>
      files(s, d).selectExpr(
        "count(*) AS n",
        "floor(percentile(fileSize, 0.5)) AS p50",
        "floor(percentile(fileSize, 0.9)) AS p90",
        "floor(percentile(fileSize, 0.99)) AS p99",
        "max(fileSize) AS p100")),

    // small-file compaction report: the 10 directories with the most
    // sub-block files (< 64 MiB — the HDFS small-file hazard NNA's
    // suggestions metrics track), with the bytes a compaction would
    // coalesce. One shuffle on the parent dir; top-10 is TakeOrdered
    // with a deterministic parent tiebreak, never a global sort.
    "nna_compaction_candidates" -> ((s, d) =>
      files(s, d).groupBy(col("parent"))
        .agg(
          sum(when(col("fileSize") < 67108864L, 1L).otherwise(0L)).as("n_small"),
          sum(when(col("fileSize") < 67108864L, col("fileSize")).otherwise(0L))
            .as("small_bytes"))
        .orderBy(col("n_small").desc, col("parent").asc)
        .limit(10)),

    // grouped percentiles: the per-key variant of the size census — same
    // floored linear-interpolation values DuckDB's quantile_cont yields;
    // one shuffle on the group key (sort-based agg within partitions)
    "nna_percentiles_per_user" -> ((s, d) =>
      files(s, d).groupBy(col("user")).agg(
        count(lit(1)).as("n"),
        expr("floor(percentile(fileSize, 0.5))").cast("long").as("p50"),
        expr("floor(percentile(fileSize, 0.9))").cast("long").as("p90"),
        max(col("fileSize")).as("p100"))),

    // The PRODUCTION percentile path: approx_percentile (GK sketch, bounded
    // memory, no value shuffle — the only shape that holds at billions of
    // inodes). Its guarantee is on RANK, not value: the returned value's
    // rank is within n·(p ± 1/accuracy). The query verifies that guarantee
    // in-engine — rank-position booleans per percentile — so the oracle
    // (exact ranks + literal TRUEs) fails the round if the sketch ever
    // drifts out of bounds. Two scalar aggregates crossJoined: scalar ×
    // scalar, no distributed join.
    "nna_size_percentiles_approx" -> ((s, d) => {
      val fs = files(s, d)
      val acc = 1000 // rank error ≤ n/1000
      val approx = fs.selectExpr(
        s"approx_percentile(fileSize, 0.5, $acc) AS a50",
        s"approx_percentile(fileSize, 0.9, $acc) AS a90",
        s"approx_percentile(fileSize, 0.99, $acc) AS a99")
      def okExpr(p: Double, a: String): String = {
        // ties make a value's rank an interval [cnt_lt, cnt_le]; the sketch
        // is in-bounds when that interval intersects n·(p ± eps)
        val eps = 1.0 / acc + 1e-9
        s"(sum(CASE WHEN fileSize <= $a THEN 1 ELSE 0 END) >= floor(count(*) * ${p - eps})) AND " +
        s"(sum(CASE WHEN fileSize < $a THEN 1 ELSE 0 END) <= ceil(count(*) * ${p + eps}))"
      }
      fs.crossJoin(approx).selectExpr(
        "count(*) AS n",
        okExpr(0.5, "a50") + " AS ok_p50",
        okExpr(0.9, "a90") + " AS ok_p90",
        okExpr(0.99, "a99") + " AS ok_p99")
    }),

    // G7 `/token`: per-user last-seen from delegation tokens. The token
    // frame is derived deterministically from `events` (principal strings
    // with host/realm decorations + an occasional distinct realUser) so the
    // kerberos service-name extraction and owner∪realUser∪max semantics are
    // all oracle-exercised.
    "nna_token_users" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
      val tokens = ev.select(
        concat(lit("u"), (col("user_id") % 50).cast("string"),
          when(col("user_id") % 3 === 0, lit("/host1.example.com@EXAMPLE.COM"))
            .when(col("user_id") % 3 === 1, lit("@EXAMPLE.COM"))
            .otherwise(lit(""))).as("owner"),
        when(col("event_type") === "purchase",
          concat(lit("svc"), (col("user_id") % 5).cast("string"),
            lit("@EXAMPLE.COM"))).otherwise(lit("")).as("realUser"),
        expr("ts div 1000000").as("issueDate"))
      graft.api.TokenAnalysis.lastLogins(tokens)
    }),

    // Snapshot-delta analytics (the reference's history-DB trend capability,
    // `HsqlDriver.java:105-200` / `logHistoryPerUser`): diff the fixture
    // "previous" snapshot against the current one on stable inode ids —
    // one full-outer shuffle join — then attribute growth.
    "nna_snapshot_diff" -> ((s, d) =>
      graft.operators.SnapshotDiff.diff(
        graft.inodes.SnapshotFixture.previous(s, d), inodes(s, d))),

    "nna_growth_by_user" -> ((s, d) =>
      graft.operators.SnapshotDiff.growthByUser(
        graft.operators.SnapshotDiff.diff(
          graft.inodes.SnapshotFixture.previous(s, d), inodes(s, d)))),

    "nna_growth_by_dir" -> ((s, d) =>
      graft.operators.SnapshotDiff.growthByDir(
        graft.operators.SnapshotDiff.diff(
          graft.inodes.SnapshotFixture.previous(s, d), inodes(s, d)),
        depth = 2)),

    // Multi-cycle trend analytics over the derived history table
    // (`HsqlDriver.java` keeps exactly this per-cycle per-user shape; its
    // dashboards answer "who is growing and how fast"). First the history
    // table itself — a fixture-parity pinpoint — then the per-user
    // regression and the one-row census.
    "nna_history_cycles" -> ((s, d) =>
      graft.inodes.HistoryFixture.cycles(s, d)),

    "nna_trend_per_user" -> ((s, d) =>
      graft.operators.TrendAnalysis.trend(
        graft.inodes.HistoryFixture.cycles(s, d),
        keys = Seq("user"), x = "cycle", ys = Seq("bytes", "files"))),

    "nna_trend_census" -> ((s, d) =>
      graft.operators.TrendAnalysis.census(
        graft.operators.TrendAnalysis.trend(
          graft.inodes.HistoryFixture.cycles(s, d),
          keys = Seq("user"), x = "cycle", ys = Seq("bytes", "files")),
        y = "bytes"))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle statements. Each mirrors the Spark plan above exactly
  // (same aliases, integer-exact aggregates, same edge semantics).
  // ---------------------------------------------------------------------

  private def monthlyCase(timeCol: String): String = {
    val bins = Histograms.timeBins("monthly")._1
    val whens = bins.map { case (label, bound) =>
      s"WHEN $NowMs - $timeCol <= $bound THEN '$label'" }.mkString(" ")
    s"CASE $whens ELSE '23 Months+' END"
  }
  private def weeklyCase(timeCol: String): String = {
    val bins = Histograms.timeBins("weekly")._1
    val whens = bins.map { case (label, bound) =>
      s"WHEN $NowMs - $timeCol <= $bound THEN '$label'" }.mkString(" ")
    s"CASE $whens ELSE '49 Weeks+' END"
  }
  private def yearlyCase(timeCol: String): String = {
    val bins = Histograms.timeBins("yearly")._1
    val whens = bins.map { case (label, bound) =>
      s"WHEN $NowMs - $timeCol <= $bound THEN '$label'" }.mkString(" ")
    s"CASE $whens ELSE '4 Years+' END"
  }
  private def binsValues(keys: Seq[String]): String =
    keys.map(k => s"('$k')").mkString(", ")

  private val spaceCase: String = {
    val whens = Histograms.spaceBins.map { case (label, bound) =>
      s"WHEN fileSize <= $bound THEN '$label'" }.mkString(" ")
    s"CASE $whens ELSE '1 GB+' END"
  }
  private val memCaseAll: String = {
    val mc = "CASE WHEN isFile THEN 150 + 150 * numBlocks ELSE 150 END"
    val whens = Histograms.memoryBins.map { case (label, bound) =>
      s"WHEN ($mc) <= $bound THEN '$label'" }.mkString(" ")
    s"CASE $whens ELSE '64 KB+' END"
  }
  private val storageCase: String = {
    val whens = InodeView.StoragePolicies.map { case (id, nm) =>
      s"WHEN storagePolicyId = $id THEN '$nm'" }.mkString(" ")
    s"CASE $whens ELSE 'NO_MAPPING' END"
  }
  // mirrors FileTypes.classify on the names this fixture generates
  private val fileTypeCase: String =
    "CASE WHEN name LIKE 'part-0%' THEN 'PART' " +
    "WHEN name LIKE '%.parquet' THEN 'PARQUET' " +
    "WHEN name LIKE '%.avro' THEN 'AVRO' " +
    "WHEN name LIKE '%.log' THEN 'LOG' " +
    "WHEN name LIKE '%.txt' THEN 'TXT' " +
    "WHEN name LIKE '%.gz' THEN 'GZIP' " +
    "WHEN name LIKE '%.json' THEN 'JSON' " +
    "WHEN name LIKE '%.csv' THEN 'CSV' " +
    "WHEN name LIKE '%.orc' THEN 'ORC' ELSE 'UNKNOWN' END"

  /** Ids of inodes under any dir carrying the given quota kind, via the
    * same proper-ancestor-prefix explode the engine runs
    * (`PathStructure.withAncestors`): split the path, join each prefix
    * (excluding root and self) against the quota-dir paths. */
  private def ancestorHitsSql(quotaField: String): String =
    "SELECT DISTINCT a.id FROM (" +
    "  SELECT sp.id, array_to_string(sp.parts[1:t.i], '/') AS ancestor" +
    "  FROM (SELECT id, string_split(path, '/') AS parts FROM inodes) sp," +
    "  UNNEST(generate_series(2, len(sp.parts) - 1)) AS t(i)" +
    "  WHERE len(sp.parts) > 2) a " +
    s"JOIN (SELECT path FROM inodes WHERE NOT isFile AND $quotaField >= 0) q " +
    "ON a.ancestor = q.path"

  val oracleSql: Map[String, String] = Map(
    "nna_filter_count" -> oracle(
      "SELECT COUNT(*) AS cnt FROM inodes WHERE isFile AND fileSize = 0"),

    "nna_filter_multi" -> oracle(
      "SELECT COUNT(*) AS cnt, " +
      "CAST(SUM(fileSize * fileReplica) AS BIGINT) AS diskspaceConsumed, " +
      "CAST(SUM(numBlocks * fileReplica) AS BIGINT) AS numReplicas " +
      "FROM inodes WHERE isFile AND fileSize >= 1048576 AND numBlocks < 3 AND fileReplica > 2"),

    "nna_filter_string" -> oracle(
      "SELECT COUNT(*) AS cnt FROM inodes WHERE isFile " +
      "AND name LIKE '%.parquet' AND path NOT LIKE '/A%' AND path LIKE '%/d4%'"),

    "nna_filter_bool" -> oracle(
      "SELECT COUNT(*) AS cnt FROM inodes WHERE isFile " +
      "AND isWithSnapshot AND NOT hasAcl"),

    "nna_filter_date" -> oracle(
      "SELECT COUNT(*) AS cnt FROM inodes WHERE isFile " +
      "AND CAST(make_timestamp(modTime * 1000) AS DATE) >= DATE '2024-07-01'"),

    "nna_filter_time_ago" -> oracle(
      s"SELECT COUNT(*) AS cnt, CAST(SUM(fileSize) AS BIGINT) AS fileSize " +
      s"FROM inodes WHERE isFile AND modTime >= ${NowMs - 90L * dayMs}"),

    "nna_filter_older_perm" -> oracle(
      s"SELECT COUNT(*) AS cnt FROM inodes WHERE isFile " +
      s"AND accessTime <= ${NowMs - 365L * dayMs} AND permission = 755 AND depth = 4"),

    "nna_dump_paths" -> oracle(
      "SELECT path FROM inodes WHERE isFile AND \"user\" = 'u1' AND fileSize > 0 " +
      "ORDER BY path LIMIT 50"),

    "nna_find_global_max" -> oracle(
      "SELECT path, fileSize AS value FROM inodes WHERE isFile " +
      "ORDER BY fileSize DESC, id ASC LIMIT 1"),

    "nna_sum_all_fields" -> oracle(
      "SELECT COUNT(*) AS cnt, CAST(SUM(fileSize) AS BIGINT) AS fileSize, " +
      "CAST(SUM(fileSize * fileReplica) AS BIGINT) AS diskspaceConsumed, " +
      "CAST(SUM(blockSize) AS BIGINT) AS blockSize, " +
      "CAST(SUM(numBlocks) AS BIGINT) AS numBlocks, " +
      "CAST(SUM(numBlocks * fileReplica) AS BIGINT) AS numReplicas, " +
      "CAST(SUM(150 + 150 * numBlocks) AS BIGINT) AS memoryConsumed " +
      "FROM inodes WHERE isFile"),

    "nna_sum_quota" -> oracle(
      "SELECT COUNT(*) AS cnt, CAST(SUM(nsQuota) AS BIGINT) AS nsQuota, " +
      "CAST(SUM(nsQuotaUsed) AS BIGINT) AS nsQuotaUsed, " +
      "CAST(SUM(dsQuotaUsed) AS BIGINT) AS dsQuotaUsed, " +
      "CAST(SUM(CAST(FLOOR(nsQuotaUsed * 100.0 / nsQuota) AS BIGINT)) AS BIGINT) AS nsQuotaRatioUsed " +
      "FROM inodes WHERE NOT isFile AND hasQuota"),

    "nna_histogram_user" -> oracle(
      "SELECT \"user\" AS key, COUNT(*) AS value FROM inodes WHERE isFile GROUP BY \"user\""),

    "nna_histogram_user_salted" -> oracle(
      "SELECT \"user\" AS key, COUNT(*) AS value FROM inodes WHERE isFile GROUP BY \"user\""),

    "nna_histogram_group_ds" -> oracle(
      "SELECT \"group\" AS key, CAST(SUM(fileSize * fileReplica) AS BIGINT) AS value " +
      "FROM inodes GROUP BY \"group\""),

    "nna_histogram_find" -> oracle(
      "SELECT \"user\" AS key, CAST(MIN(fileSize) AS BIGINT) AS minv, " +
      "CAST(MAX(fileSize) AS BIGINT) AS maxv, " +
      "CAST(FLOOR(AVG(fileSize)) AS BIGINT) AS avgv " +
      "FROM inodes WHERE isFile GROUP BY \"user\""),

    "nna_histogram2" -> oracle(
      s"SELECT \"user\" AS key1, $storageCase AS key2, COUNT(*) AS value " +
      "FROM inodes WHERE isFile GROUP BY 1, 2"),

    "nna_histogram_multisum" -> oracle(
      "SELECT \"user\" AS key, COUNT(*) AS cnt, " +
      "CAST(SUM(fileSize) AS BIGINT) AS fileSize, " +
      "CAST(SUM(fileSize * fileReplica) AS BIGINT) AS diskspaceConsumed " +
      "FROM inodes WHERE isFile GROUP BY \"user\""),

    "nna_histogram_filesize_bins" -> oracle(
      s"SELECT $spaceCase AS key, COUNT(*) AS value FROM inodes WHERE isFile GROUP BY 1"),

    "nna_histogram_memory_bins" -> oracle(
      s"SELECT $memCaseAll AS key, COUNT(*) AS value FROM inodes GROUP BY 1"),

    "nna_histogram_time_monthly" -> oracle(
      s"SELECT b.key AS key, CAST(COALESCE(h.value, 0) AS BIGINT) AS value " +
      s"FROM (VALUES ${binsValues(Histograms.timeKeys("monthly"))}) b(key) " +
      s"LEFT JOIN (SELECT ${monthlyCase("modTime")} AS key, COUNT(*) AS value " +
      s"FROM inodes WHERE isFile GROUP BY 1) h ON b.key = h.key"),

    "nna_histogram_time_yearly" -> oracle(
      s"SELECT b.key AS key, CAST(COALESCE(h.value, 0) AS BIGINT) AS value " +
      s"FROM (VALUES ${binsValues(Histograms.timeKeys("yearly"))}) b(key) " +
      s"LEFT JOIN (SELECT ${yearlyCase("accessTime")} AS key, COUNT(*) AS value " +
      s"FROM inodes WHERE isFile GROUP BY 1) h ON b.key = h.key"),

    "nna_histogram_moddate" -> oracle(
      "SELECT strftime(make_timestamp(modTime * 1000), '%m/%d/%Y') AS key, " +
      "COUNT(*) AS value FROM inodes WHERE isFile GROUP BY 1"),

    "nna_histogram_filetype" -> oracle(
      s"SELECT $fileTypeCase AS key, COUNT(*) AS value FROM inodes WHERE isFile GROUP BY 1"),

    "nna_histogram_storage" -> oracle(
      s"SELECT $storageCase AS key, COUNT(*) AS value FROM inodes WHERE isFile GROUP BY 1"),

    "nna_histogram_replica" -> oracle(
      "SELECT CAST(fileReplica AS VARCHAR) AS key, COUNT(*) AS value " +
      "FROM inodes WHERE isFile GROUP BY 1"),

    "nna_histogram_parentdir" -> oracle(
      "SELECT regexp_extract(path, '^(/[^/]+/[^/]+)', 1) AS key, " +
      "CAST(SUM(fileSize) AS BIGINT) AS value FROM inodes WHERE isFile GROUP BY 1"),

    "nna_histogram_dirquota" -> oracle(
      "SELECT path AS key, CAST(FLOOR(nsQuotaUsed * 100.0 / nsQuota) AS BIGINT) AS value " +
      "FROM inodes WHERE NOT isFile AND hasQuota " +
      "AND CAST(FLOOR(nsQuotaUsed * 100.0 / nsQuota) AS BIGINT) > 0"),

    "nna_having" -> oracle(
      "SELECT \"user\" AS key, COUNT(*) AS value FROM inodes WHERE isFile " +
      "GROUP BY \"user\" HAVING COUNT(*) > 100"),

    "nna_topk" -> oracle(
      "SELECT \"user\" AS key, CAST(SUM(fileSize * fileReplica) AS BIGINT) AS value " +
      "FROM inodes WHERE isFile GROUP BY \"user\" ORDER BY value DESC, key ASC LIMIT 5"),

    "nna_bottomk" -> oracle(
      "SELECT \"user\" AS key, COUNT(*) AS value FROM inodes WHERE isFile " +
      "GROUP BY \"user\" ORDER BY value ASC, key ASC LIMIT 3"),

    "nna_topk_per_user" -> oracle(
      "SELECT \"user\", path, fileSize, rk FROM (" +
      "SELECT \"user\", path, fileSize, CAST(ROW_NUMBER() OVER (" +
      "PARTITION BY \"user\" ORDER BY fileSize DESC, path ASC) AS INT) AS rk " +
      "FROM inodes WHERE isFile) WHERE rk <= 3"),

    "nna_divide" -> oracle(
      "SELECT CAST(FLOOR(1000000.0 * " +
      "(SELECT COUNT(*) FROM inodes WHERE isFile AND fileSize > 0 AND fileSize <= 1024) / " +
      "(SELECT COUNT(*) FROM inodes WHERE isFile)) AS BIGINT) AS ratio_ppm"),

    "nna_content_summary" -> oracle(
      "SELECT CAST(SUM(CASE WHEN isFile THEN 1 ELSE 0 END) AS BIGINT) AS fileCount, " +
      "CAST(SUM(CASE WHEN isFile THEN 0 ELSE 1 END) AS BIGINT) AS dirCount, " +
      "CAST(SUM(CASE WHEN isFile THEN fileSize ELSE 0 END) AS BIGINT) AS length, " +
      "CAST(SUM(CASE WHEN isFile THEN fileSize * fileReplica ELSE 0 END) AS BIGINT) AS spaceConsumed " +
      "FROM inodes WHERE path = '/R/F' OR path LIKE '/R/F/%'"),

    // proper-ancestor walk (mirrors PathStructure.withAncestors): quota now
    // lives at depth 2 AND 3, so a direct-parent formulation would be wrong
    "nna_under_ns_quota" -> oracle(
      "SELECT COUNT(*) AS cnt FROM inodes f WHERE f.isFile AND f.id IN (" +
      ancestorHitsSql("nsQuota") + ")"),

    "nna_dir_subtree" -> oracle(
      "SELECT d.path AS path, CAST(SUM(f.fileSize) AS BIGINT) AS dirSubTreeSize, " +
      "COUNT(*) AS dirSubTreeNumFiles " +
      "FROM inodes d JOIN inodes f ON f.isFile AND f.path LIKE d.path || '/%' " +
      "WHERE NOT d.isFile AND d.depth <= 2 GROUP BY d.path ORDER BY d.path"),

    "nna_transform" -> oracle(
      "SELECT CAST(SUM(CASE WHEN path LIKE '/A%' THEN fileSize * 2 " +
      "ELSE fileSize * fileReplica END) AS BIGINT) AS diskspaceConsumed, " +
      "CAST(SUM(CASE WHEN path LIKE '/A%' THEN numBlocks * 2 " +
      "ELSE numBlocks * fileReplica END) AS BIGINT) AS numReplicas " +
      "FROM inodes WHERE isFile"),

    "nna_sql" -> oracle(
      "SELECT \"user\" AS key, CAST(SUM(fileSize) AS BIGINT) AS value " +
      "FROM inodes WHERE isFile AND fileSize > 0 GROUP BY \"user\""),

    "nna_suggestions_core" -> oracle(
      "SELECT " +
      "CAST(SUM(CASE WHEN isFile AND fileSize = 0 THEN 1 ELSE 0 END) AS BIGINT) AS emptyFiles, " +
      "CAST(SUM(CASE WHEN isFile AND fileSize > 0 AND fileSize <= 1024 THEN 1 ELSE 0 END) AS BIGINT) AS tinyFiles, " +
      "CAST(SUM(CASE WHEN isFile AND fileSize > 1024 AND fileSize <= 1048576 THEN 1 ELSE 0 END) AS BIGINT) AS smallFiles, " +
      "CAST(SUM(CASE WHEN isFile AND fileSize > 1048576 AND fileSize <= 134217728 THEN 1 ELSE 0 END) AS BIGINT) AS mediumFiles, " +
      "CAST(SUM(CASE WHEN isFile AND fileSize > 134217728 THEN 1 ELSE 0 END) AS BIGINT) AS largeFiles, " +
      "CAST(SUM(CASE WHEN NOT isFile AND dirNumChildren = 0 THEN 1 ELSE 0 END) AS BIGINT) AS emptyDirs " +
      "FROM inodes"),

    "nna_suggestions_peruser" -> oracle(
      s"SELECT \"user\" AS key, " +
      "CAST(SUM(CASE WHEN fileSize = 0 THEN 1 ELSE 0 END) AS BIGINT) AS emptyFiles, " +
      "CAST(SUM(CASE WHEN fileSize > 0 AND fileSize <= 1024 THEN 1 ELSE 0 END) AS BIGINT) AS tinyFiles, " +
      s"CAST(SUM(CASE WHEN accessTime <= ${NowMs - 365L * dayMs} THEN 1 ELSE 0 END) AS BIGINT) AS oldFiles1yr " +
      "FROM inodes WHERE isFile GROUP BY \"user\""),

    "nna_api_filter" -> oracle(
      "SELECT COUNT(*) AS count, CAST(SUM(fileSize) AS BIGINT) AS fileSize, " +
      "CAST(SUM(fileSize * fileReplica) AS BIGINT) AS diskspaceConsumed " +
      "FROM inodes WHERE isFile AND fileSize > 0 AND fileReplica >= 3"),

    "nna_api_histogram2" -> oracle(
      s"SELECT \"user\" AS key, $fileTypeCase AS key2, COUNT(*) AS value " +
      "FROM inodes WHERE isFile GROUP BY 1, 2"),

    "nna_api_weekly_having" -> oracle(
      s"SELECT ${weeklyCase("modTime")} AS key, COUNT(*) AS value " +
      "FROM inodes WHERE isFile GROUP BY 1 HAVING COUNT(*) > 50 " +
      "ORDER BY value DESC, key ASC"),

    "nna_api_transform_hist" -> oracle(
      "SELECT \"user\" AS key, CAST(SUM(CASE WHEN path LIKE '/N%' THEN fileSize * 1 " +
      "ELSE fileSize * fileReplica END) AS BIGINT) AS value " +
      "FROM inodes WHERE isFile GROUP BY 1"),

    "nna_api_divide" -> oracle(
      "SELECT CAST(FLOOR(1000000.0 * " +
      "(SELECT COUNT(*) FROM inodes WHERE isFile AND isWithSnapshot) / " +
      "(SELECT COUNT(*) FROM inodes WHERE isFile)) AS BIGINT) AS ratio_ppm"),

    "nna_suggestions_values" -> oracle {
      val now24h = NowMs - 24L * 3600000L
      val now1y = NowMs - 365L * dayMs
      val now2y = NowMs - 2 * 365L * dayMs
      def cnt(cond: String, name: String) =
        s"CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS $name"
      def csum(cond: String, expr: String, name: String) =
        s"CAST(SUM(CASE WHEN $cond THEN $expr ELSE 0 END) AS BIGINT) AS $name"
      val mem = "150 + 150 * numBlocks"
      val ds = "fileSize * fileReplica"
      val fileCols = Seq(
        "COUNT(*) AS numFiles",
        cnt("fileSize = 0", "emptyFiles"),
        cnt("fileSize > 0 AND fileSize <= 1024", "tinyFiles"),
        cnt("fileSize > 1024 AND fileSize <= 1048576", "smallFiles"),
        cnt("fileSize > 1048576 AND fileSize <= 134217728", "mediumFiles"),
        cnt("fileSize > 134217728", "largeFiles"),
        cnt(s"fileSize = 0 AND modTime >= $now24h", "emptyFiles24h"),
        cnt(s"fileSize > 0 AND fileSize <= 1024 AND modTime >= $now24h", "tinyFiles24h"),
        cnt(s"fileSize > 1024 AND fileSize <= 1048576 AND modTime >= $now24h", "smallFiles24h"),
        cnt(s"fileSize = 0 AND accessTime <= $now1y", "emptyFiles1yr"),
        cnt(s"fileSize > 0 AND fileSize <= 1024 AND accessTime <= $now1y", "tinyFiles1yr"),
        cnt(s"accessTime <= $now1y", "oldFiles1yr"),
        cnt(s"accessTime <= $now2y", "oldFiles2yr"),
        csum("fileSize = 0", mem, "emptyFilesMem"),
        csum("fileSize > 0 AND fileSize <= 1024", ds, "tinyFilesDs"),
        csum("fileSize > 1024 AND fileSize <= 1048576", ds, "smallFilesDs"),
        csum(s"accessTime <= $now1y", ds, "oldFiles1yrDs"),
        "CAST(SUM(fileSize) AS BIGINT) AS totalBytes",
        s"CAST(SUM($ds) AS BIGINT) AS totalDiskspace",
        s"CAST(SUM($mem) AS BIGINT) AS totalFileMem",
        "CAST(SUM(numBlocks) AS BIGINT) AS totalBlocks").mkString(", ")
      val ratio = "FLOOR(nsQuotaUsed * 100.0 / nsQuota)"
      val dratio = "FLOOR(dsQuotaUsed * 100.0 / dsQuota)"
      val dirCols = Seq(
        "COUNT(*) AS numDirs",
        cnt("dirNumChildren = 0", "emptyDirs"),
        cnt("hasQuota", "quotaDirs"),
        cnt(s"hasQuota AND $ratio >= 85", "nsQuotaHighDirs"),
        cnt(s"hasQuota AND $dratio >= 85", "dsQuotaHighDirs")).mkString(", ")
      s"SELECT * FROM (SELECT $fileCols FROM inodes WHERE isFile) " +
        s"CROSS JOIN (SELECT $dirCols FROM inodes WHERE NOT isFile)"
    },

    "nna_top_directories" -> oracle(
      "SELECT regexp_extract(path, '^(/[^/]+/[^/]+)', 1) AS path, " +
      "COUNT(*) AS numFiles, " +
      "CAST(SUM(fileSize * fileReplica) AS BIGINT) AS diskspaceConsumed " +
      "FROM inodes WHERE isFile GROUP BY 1 " +
      "ORDER BY numFiles DESC, path ASC LIMIT 5"),

    "nna_histogram_time_daily" -> oracle {
      val bins = Histograms.timeBins("daily")._1
      val whens = bins.map { case (label, bound) =>
        s"WHEN $NowMs - modTime <= $bound THEN '$label'" }.mkString(" ")
      s"SELECT CASE $whens ELSE '364 Days+' END AS key, COUNT(*) AS value " +
        "FROM inodes WHERE isFile GROUP BY 1"
    },

    "nna_histogram_diskspace_bins" -> oracle {
      val whens = Histograms.spaceBins.map { case (label, bound) =>
        s"WHEN fileSize * fileReplica <= $bound THEN '$label'" }.mkString(" ")
      s"SELECT CASE $whens ELSE '1 GB+' END AS key, COUNT(*) AS value " +
        "FROM inodes WHERE isFile GROUP BY 1"
    },

    "nna_histogram_accessdate" -> oracle(
      "SELECT strftime(make_timestamp(accessTime * 1000), '%m/%d/%Y') AS key, " +
      "COUNT(*) AS value FROM inodes GROUP BY 1"),

    "nna_filter_subtree" -> oracle(
      "SELECT COUNT(*) AS count, CAST(SUM(d.dirNumChildren) AS BIGINT) AS dirNumChildren " +
      "FROM inodes d WHERE NOT d.isFile AND d.depth <= 3 AND " +
      "(SELECT COUNT(*) FROM inodes f WHERE f.isFile AND f.path LIKE d.path || '/%') >= 100"),

    "nna_filter_under_quota" -> oracle(
      "SELECT COUNT(*) AS count FROM inodes f WHERE f.isFile AND f.fileSize > 0 " +
      "AND f.id IN (" + ancestorHitsSql("nsQuota") + ")"),

    "nna_user_quotas" -> oracle(
      "SELECT \"user\", COUNT(*) AS quotaDirs, " +
      "CAST(SUM(nsQuota) AS BIGINT) AS nsQuotaAssigned, " +
      "CAST(SUM(nsQuotaUsed) AS BIGINT) AS nsQuotaUsed, " +
      "CAST(SUM(dsQuota) AS BIGINT) AS dsQuotaAssigned, " +
      "CAST(SUM(dsQuotaUsed) AS BIGINT) AS dsQuotaUsed, " +
      "CAST(SUM(CASE WHEN FLOOR(nsQuotaUsed * 100.0 / nsQuota) >= 85 THEN 1 ELSE 0 END) AS BIGINT) AS nsQuotaHighDirs, " +
      "CAST(SUM(CASE WHEN FLOOR(dsQuotaUsed * 100.0 / dsQuota) >= 85 THEN 1 ELSE 0 END) AS BIGINT) AS dsQuotaHighDirs " +
      "FROM inodes WHERE NOT isFile AND hasQuota GROUP BY \"user\""),

    "nna_histogram2_pivot" -> oracle {
      val cols = (InodeView.StoragePolicies.map(_._2) :+ "NO_MAPPING").map { p =>
        s"CAST(SUM(CASE WHEN $storageCase = '$p' THEN 1 ELSE 0 END) AS BIGINT) AS \"$p\""
      }.mkString(", ")
      s"SELECT \"user\" AS key, $cols FROM inodes WHERE isFile GROUP BY \"user\""
    },

    "nna_histogram_find_all" -> oracle(
      "SELECT \"group\" AS key, CAST(FLOOR(AVG(CASE WHEN isFile " +
      "THEN 150 + 150 * numBlocks ELSE 150 END)) AS BIGINT) AS value " +
      "FROM inodes GROUP BY \"group\""),

    "nna_size_percentiles" -> oracle(
      "SELECT COUNT(*) AS n, " +
      "CAST(FLOOR(quantile_cont(fileSize, 0.5)) AS BIGINT) AS p50, " +
      "CAST(FLOOR(quantile_cont(fileSize, 0.9)) AS BIGINT) AS p90, " +
      "CAST(FLOOR(quantile_cont(fileSize, 0.99)) AS BIGINT) AS p99, " +
      "CAST(MAX(fileSize) AS BIGINT) AS p100 FROM inodes WHERE isFile"),

    "nna_compaction_candidates" -> oracle(
      "SELECT parent, " +
      "CAST(SUM(CASE WHEN fileSize < 67108864 THEN 1 ELSE 0 END) AS BIGINT) AS n_small, " +
      "CAST(SUM(CASE WHEN fileSize < 67108864 THEN fileSize ELSE 0 END) AS BIGINT) AS small_bytes " +
      "FROM inodes WHERE isFile GROUP BY parent " +
      "ORDER BY n_small DESC, parent ASC LIMIT 10"),

    "nna_percentiles_per_user" -> oracle(
      "SELECT \"user\", COUNT(*) AS n, " +
      "CAST(FLOOR(quantile_cont(fileSize, 0.5)) AS BIGINT) AS p50, " +
      "CAST(FLOOR(quantile_cont(fileSize, 0.9)) AS BIGINT) AS p90, " +
      "CAST(MAX(fileSize) AS BIGINT) AS p100 " +
      "FROM inodes WHERE isFile GROUP BY \"user\""),

    // the sketch's rank guarantee, asserted by the oracle: the engine's
    // booleans must all come back TRUE or the hash mismatches
    "nna_size_percentiles_approx" -> oracle(
      "SELECT COUNT(*) AS n, TRUE AS ok_p50, TRUE AS ok_p90, " +
      "TRUE AS ok_p99 FROM inodes WHERE isFile"),

    "nna_token_users" ->
      ("WITH tok AS (SELECT " +
       "'u' || CAST(user_id % 50 AS VARCHAR) || " +
       "CASE WHEN user_id % 3 = 0 THEN '/host1.example.com@EXAMPLE.COM' " +
       "WHEN user_id % 3 = 1 THEN '@EXAMPLE.COM' ELSE '' END AS owner, " +
       "CASE WHEN event_type = 'purchase' THEN " +
       "'svc' || CAST(user_id % 5 AS VARCHAR) || '@EXAMPLE.COM' " +
       "ELSE '' END AS realUser, " +
       "epoch_ns(ts) // 1000000 AS issueDate FROM events), " +
       "u AS (SELECT regexp_extract(owner, '^([^/@]+)', 1) AS \"user\", issueDate FROM tok " +
       "UNION ALL " +
       "SELECT regexp_extract(realUser, '^([^/@]+)', 1), issueDate FROM tok " +
       "WHERE realUser IS NOT NULL AND realUser <> '' AND realUser <> owner) " +
       "SELECT \"user\", MAX(issueDate) AS last_seen FROM u GROUP BY \"user\"")
  ) ++ snapshotDiffOracles ++ trendOracles

  /** Oracles for the snapshot-delta family: the inode CTE plus the
    * snap_a / snap_diff CTEs ([[graft.inodes.SnapshotFixture]]). */
  private def diffOracle(select: String): String =
    InodeView.oracleCte + graft.inodes.SnapshotFixture.oracleSnapACte + select

  // def, not val: referenced from the `oracleSql` val above (declared
  // first), so a val here would still be null during object init
  private def snapshotDiffOracles: Map[String, String] = Map(
    "nna_snapshot_diff" -> diffOracle(
      "SELECT id, change, path, \"user\", parent, isFile, " +
      "bytesBefore, bytesAfter, bytesDelta FROM snap_diff"),

    "nna_growth_by_user" -> diffOracle(
      "SELECT \"user\", " +
      "CAST(SUM(CASE WHEN change = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS filesAdded, " +
      "CAST(SUM(CASE WHEN change = 'deleted' THEN 1 ELSE 0 END) AS BIGINT) AS filesDeleted, " +
      "CAST(SUM(CASE WHEN change = 'modified' THEN 1 ELSE 0 END) AS BIGINT) AS filesModified, " +
      "CAST(SUM(CASE WHEN change = 'added' THEN 1 WHEN change = 'deleted' THEN -1 ELSE 0 END) AS BIGINT) AS filesDelta, " +
      "CAST(SUM(bytesDelta) AS BIGINT) AS bytesDelta " +
      "FROM snap_diff WHERE isFile GROUP BY \"user\""),

    "nna_growth_by_dir" -> diffOracle(
      "SELECT array_to_string(string_split(path, '/')[1:3], '/') AS dirPath, " +
      "CAST(SUM(CASE WHEN change = 'added' THEN 1 WHEN change = 'deleted' THEN -1 ELSE 0 END) AS BIGINT) AS filesDelta, " +
      "CAST(SUM(bytesDelta) AS BIGINT) AS bytesDelta, " +
      "CAST(SUM(CASE WHEN change = 'modified' THEN 1 ELSE 0 END) AS BIGINT) AS filesModified " +
      "FROM snap_diff WHERE isFile AND len(string_split(path, '/')) - 1 > 2 " +
      "GROUP BY 1")
  )

  /** Oracles for the trend family: the inode CTE plus the `hist` CTE
    * ([[graft.inodes.HistoryFixture]]). HUGEINT keeps `n·Σxy - Σx·Σy`
    * exact; `//` only ever divides non-negative values (the CASE mirrors
    * [[graft.operators.TrendAnalysis.slopeMilli]]'s truncation toward
    * zero, where floor and truncation coincide). */
  private def histOracle(select: String): String =
    InodeView.oracleCte + graft.inodes.HistoryFixture.oracleHistCte() + select

  private def trendSlope(num: String, den: String): String =
    s"CAST(CASE WHEN ($den) = 0 THEN NULL " +
    s"WHEN $num >= 0 THEN (1000 * ($num)) // ($den) " +
    s"ELSE -((1000 * (-($num))) // ($den)) END AS BIGINT)"

  // def, not val: evaluated during `oracleSql`'s init (see above)
  private def trendCte: String =
    """
, tagg AS (
  SELECT "user",
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(cycle) AS BIGINT) AS sx,
    CAST(SUM(cycle * cycle) AS BIGINT) AS sxx,
    arg_min(bytes, cycle) AS bytesFirst, arg_max(bytes, cycle) AS bytesLast,
    CAST(SUM(CAST(bytes AS HUGEINT)) AS HUGEINT) AS sy_bytes,
    CAST(SUM(CAST(cycle AS HUGEINT) * bytes) AS HUGEINT) AS sxy_bytes,
    arg_min(files, cycle) AS filesFirst, arg_max(files, cycle) AS filesLast,
    CAST(SUM(CAST(files AS HUGEINT)) AS HUGEINT) AS sy_files,
    CAST(SUM(CAST(cycle AS HUGEINT) * files) AS HUGEINT) AS sxy_files
  FROM hist GROUP BY "user"
), trend AS (
  SELECT "user", n AS nCycles, bytesFirst, bytesLast,
    bytesLast - bytesFirst AS bytesDelta,
    """ + trendSlope("n * sxy_bytes - sx * sy_bytes", "n * sxx - sx * sx") +
    """ AS bytesSlopeMilli,
    filesFirst, filesLast, filesLast - filesFirst AS filesDelta,
    """ + trendSlope("n * sxy_files - sx * sy_files", "n * sxx - sx * sx") +
    """ AS filesSlopeMilli
  FROM tagg
)
"""

  private def trendOracles: Map[String, String] = Map(
    "nna_history_cycles" -> histOracle(
      "SELECT cycle, \"user\", files, bytes FROM hist"),

    "nna_trend_per_user" -> histOracle(trendCte +
      "SELECT \"user\", nCycles, bytesFirst, bytesLast, bytesDelta, " +
      "bytesSlopeMilli, filesFirst, filesLast, filesDelta, filesSlopeMilli " +
      "FROM trend"),

    "nna_trend_census" -> histOracle(trendCte +
      "SELECT CAST(COUNT(*) AS BIGINT) AS nKeys, " +
      "CAST(SUM(CASE WHEN bytesSlopeMilli > 0 THEN 1 ELSE 0 END) AS BIGINT) AS growing, " +
      "CAST(SUM(CASE WHEN bytesSlopeMilli < 0 THEN 1 ELSE 0 END) AS BIGINT) AS shrinking, " +
      "CAST(SUM(CASE WHEN bytesSlopeMilli = 0 THEN 1 ELSE 0 END) AS BIGINT) AS flat, " +
      "CAST(SUM(CASE WHEN bytesSlopeMilli IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS undetermined, " +
      "CAST(SUM(bytesDelta) AS BIGINT) AS netDelta FROM trend")
  )
}
