package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{Filters, Histograms, PathStructure}
import graft.ingest.FsImageSource
import graft.inodes.InodeView

/** Queries over a REAL namespace: the checked-in mini OIV delimited dump
  * (`fixtures/oiv_mini.tsv`, provenance in `tools/gen_oiv_fixture.py`),
  * ingested by [[FsImageSource]] through the same `InodeView.snapshot`
  * cache as the synthetic fixture (`oiv:` locator). Each query's oracle
  * runs DuckDB over the SAME dump file via [[FsImageSource.oracleCte]],
  * so the whole ingest derivation — permission octal, epoch times, depth/
  * parent split, quota usage from the tree — is hash-checked end-to-end.
  */
object IngestQueries {

  /** Checked-in mini dump (absolute: the driver's DuckDB runs from an
    * unknown cwd). */
  val DumpPath = "/root/repo/fixtures/oiv_mini.tsv"
  private val Locator = s"oiv:$DumpPath"

  private def inodes(s: SparkSession): DataFrame = InodeView.snapshot(s, Locator)
  private def files(s: SparkSession): DataFrame = inodes(s).where(col("isFile"))
  private def oracle(select: String): String = FsImageSource.oracleCte(DumpPath) + select

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // the ingest itself: per-user file census exercising permission parse,
    // time parse, size/replication arithmetic, ACL flag, depth derivation
    "nna_ingest_oiv" -> ((s, _) =>
      files(s).groupBy(col("user"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("fileSize")).as("bytes"),
          sum(col("fileSize") * col("fileReplica")).as("disk"),
          max(col("modTime")).as("last_mod"),
          min(col("accessTime")).as("first_access"),
          sum(col("permission")).as("perm_sum"),
          sum(when(col("hasAcl"), 1L).otherwise(0L)).as("acl_cnt"),
          sum(col("depth")).as("depth_sum"))),

    // dir side: children counts and tree shape per depth
    "nna_ingest_dirs" -> ((s, _) =>
      inodes(s).where(!col("isFile"))
        .groupBy(col("depth"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("dirNumChildren")).as("children"),
          sum(when(col("hasQuota"), 1L).otherwise(0L)).as("quota_dirs"))),

    // quota usage recomputed from the tree (dump carries no usage columns):
    // the depth-1 quota dir has files only at depth ≥4 → a true
    // deep-ancestor aggregation, checked against a prefix-join oracle
    "nna_ingest_quota" -> ((s, _) =>
      inodes(s).where(col("hasQuota"))
        .select(col("path"), col("nsQuota"), col("dsQuota"),
          col("nsQuotaUsed"), col("dsQuotaUsed"))),

    // existing operators compose unchanged over the ingested frame:
    // the histogram engine keyed on user
    "nna_ingest_histogram" -> ((s, _) =>
      Histograms.histogram(files(s), col("user"), count(lit(1)))),

    // ... the predicate compiler (octal permission + string + size ops) ...
    "nna_ingest_filter" -> ((s, _) =>
      files(s)
        .where(Filters.compileAll(
          "permission:eq:644,name:endsWith:.parquet,fileSize:gt:0", "files"))
        .agg(count(lit(1)).as("cnt"), sum(col("fileSize")).as("bytes"))),

    // ... and the quota-ancestry walk (files under the depth-1 ns-quota
    // dir sit 3 levels below it — ancestor explode, not parent lookup)
    "nna_ingest_under_quota" -> ((s, _) =>
      PathStructure.underQuota(inodes(s), "nsQuota")
        .where(col("isFile"))
        .agg(count(lit(1)).as("cnt"), sum(col("fileSize")).as("bytes"))))

  val oracleSql: Map[String, String] = Map(
    "nna_ingest_oiv" -> oracle("""
      SELECT "user", COUNT(*) AS cnt,
        CAST(SUM(fileSize) AS BIGINT) AS bytes,
        CAST(SUM(fileSize * fileReplica) AS BIGINT) AS disk,
        MAX(modTime) AS last_mod,
        MIN(accessTime) AS first_access,
        CAST(SUM(permission) AS BIGINT) AS perm_sum,
        CAST(SUM(CASE WHEN hasAcl THEN 1 ELSE 0 END) AS BIGINT) AS acl_cnt,
        CAST(SUM(depth) AS BIGINT) AS depth_sum
      FROM oiv WHERE isFile GROUP BY "user""""),

    "nna_ingest_dirs" -> oracle("""
      SELECT depth, COUNT(*) AS cnt,
        CAST(SUM(dirNumChildren) AS BIGINT) AS children,
        CAST(SUM(CASE WHEN hasQuota THEN 1 ELSE 0 END) AS BIGINT) AS quota_dirs
      FROM oiv WHERE NOT isFile GROUP BY depth"""),

    "nna_ingest_quota" -> oracle("""
      SELECT path, nsQuota, dsQuota, nsQuotaUsed, dsQuotaUsed
      FROM oiv WHERE hasQuota"""),

    "nna_ingest_histogram" -> oracle("""
      SELECT "user" AS key, COUNT(*) AS value
      FROM oiv WHERE isFile GROUP BY "user""""),

    "nna_ingest_filter" -> oracle("""
      SELECT COUNT(*) AS cnt, CAST(SUM(fileSize) AS BIGINT) AS bytes
      FROM oiv
      WHERE isFile AND permission = 644
        AND ends_with(name, '.parquet') AND fileSize > 0"""),

    "nna_ingest_under_quota" -> oracle("""
      SELECT COUNT(*) AS cnt, CAST(SUM(f.fileSize) AS BIGINT) AS bytes
      FROM oiv f
      WHERE f.isFile AND EXISTS (
        SELECT 1 FROM oiv q
        WHERE NOT q.isFile AND q.nsQuota >= 0 AND q.path <> '/'
          AND f.path LIKE q.path || '/%')"""))
}
