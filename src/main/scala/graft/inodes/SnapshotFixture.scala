package graft.inodes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A deterministic "previous" namespace snapshot derived from the current
  * one, so snapshot-delta analytics ([[graft.operators.SnapshotDiff]]) is
  * oracle-checkable: the DuckDB CTE below ([[oracleSnapACte]]) is the
  * byte-equivalent SQL of [[previous]], exactly like
  * [[InodeView.oracleCte]] mirrors the snapshot itself.
  *
  * Relative to the current snapshot B, the previous snapshot A:
  *   - is MISSING every file with `id % 17 = 0`          → "added" in B;
  *   - has a different fileSize/modTime where `id % 13 = 5` → "modified";
  *   - has EXTRA `.tmp` ghost files (id shifted by 2e9) for files with
  *     `id % 19 = 3`                                      → "deleted" in B.
  * Directories are identical in both snapshots, so a correct diff emits no
  * dir rows. All arithmetic is integer-exact; the ghost id shift (2e9) is
  * collision-free vs file ids (< 2e7 at sf0.1) and dir ids (1e9 + ~700).
  */
object SnapshotFixture {

  private val Day = InodeView.DayMs
  private val GhostIdShift = 2000000000L

  /** The "previous" snapshot (same [[InodeView.columns]] schema). Derived
    * lazily from the cached current snapshot — narrow projections only, no
    * extra shuffle beyond the snapshot derivation itself. */
  def previous(spark: SparkSession, dir: String): DataFrame = {
    val cur = InodeView.snapshot(spark, dir)
    val touched = col("isFile") && col("id") % 13 === 5
    val base = cur
      .where(!(col("isFile") && col("id") % 17 === 0))
      .withColumn("fileSize",
        when(touched, col("fileSize") + (col("id") % 1000) * 1024L)
          .otherwise(col("fileSize")))
      .withColumn("modTime",
        when(touched, col("modTime") - 30L * Day).otherwise(col("modTime")))
    val ghosts = cur.where(col("isFile") && col("id") % 19 === 3)
      .withColumn("fileSize", (col("id") % 4096) * 1024L)
      .withColumn("modTime", col("modTime") - 90L * Day)
      .withColumn("path", concat(col("path"), lit(".tmp")))
      .withColumn("name", concat(col("name"), lit(".tmp")))
      .withColumn("id", col("id") + GhostIdShift)
    val cols = InodeView.columns.map(col)
    base.select(cols: _*).unionAll(ghosts.select(cols: _*))
  }

  /** DuckDB mirror of [[previous]] as an extra CTE (`snap_a`) appended after
    * the `inodes` CTE. Narrow: only the columns [[graft.operators.SnapshotDiff]]
    * tracks. Any edit here MUST be mirrored above and vice versa. */
  val oracleSnapACte: String = s"""
, snap_a AS (
  SELECT id, path, "user", parent, isFile,
    CASE WHEN isFile AND id % 13 = 5
         THEN fileSize + (id % 1000) * 1024 ELSE fileSize END AS fileSize,
    CASE WHEN isFile AND id % 13 = 5
         THEN modTime - ${30L * Day} ELSE modTime END AS modTime,
    permission, fileReplica
  FROM inodes WHERE NOT (isFile AND id % 17 = 0)
  UNION ALL
  SELECT id + $GhostIdShift AS id, path || '.tmp' AS path, "user", parent,
    isFile, (id % 4096) * 1024 AS fileSize,
    modTime - ${90L * Day} AS modTime, permission, fileReplica
  FROM inodes WHERE isFile AND id % 19 = 3
)
, snap_diff AS (
  SELECT
    COALESCE(b.id, a.id) AS id,
    CASE WHEN a.id IS NULL THEN 'added'
         WHEN b.id IS NULL THEN 'deleted'
         ELSE 'modified' END AS change,
    COALESCE(b.path, a.path) AS path,
    COALESCE(b."user", a."user") AS "user",
    COALESCE(b.parent, a.parent) AS parent,
    COALESCE(b.isFile, a.isFile) AS isFile,
    CAST(COALESCE(a.fileSize, 0) AS BIGINT) AS bytesBefore,
    CAST(COALESCE(b.fileSize, 0) AS BIGINT) AS bytesAfter,
    CAST(COALESCE(b.fileSize, 0) - COALESCE(a.fileSize, 0) AS BIGINT) AS bytesDelta
  FROM snap_a a FULL OUTER JOIN inodes b ON a.id = b.id
  WHERE a.id IS NULL OR b.id IS NULL
     OR a.fileSize  IS DISTINCT FROM b.fileSize
     OR a.modTime   IS DISTINCT FROM b.modTime
     OR a."user"    IS DISTINCT FROM b."user"
     OR a.permission  IS DISTINCT FROM b.permission
     OR a.fileReplica IS DISTINCT FROM b.fileReplica
)
"""
}
