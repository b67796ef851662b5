package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Namespace time travel: diff two inode snapshots keyed on the stable inode
  * id and attribute growth per user / per directory.
  *
  * The reference keeps per-cycle trend history in an embedded history DB
  * (`HsqlDriver.java:105-200`, `logHistoryPerUser`) and most of its
  * suggestions UI is "what changed / who is growing"; it can answer that only
  * for the ~45 metrics it chose to log each cycle. Here the namespace
  * snapshots themselves are cheap columnar relations, so the diff is a single
  * full-outer shuffle join on `id` (both sides hash-partition on the join key;
  * no broadcast of namespace-sized data, no window, no explode) and EVERY
  * downstream attribution (per user, per directory, per fileType, …) is an
  * ordinary aggregation over the bounded diff output. At 100 TB / 1e9 inodes
  * the diff shuffles each snapshot exactly once at ~60 B/row of tracked
  * columns; rows that did not change never leave the join.
  *
  * Ids are real and stable across snapshots for every ingest front door
  * (`oivxml:`/`oivbin:` recover the namenode's inode ids; `oiv:` and the
  * fixture derive deterministic ids), which is what makes id-keyed diffing
  * correct — path-keyed diffing would misclassify renames as delete+add.
  */
object SnapshotDiff {

  /** Columns whose change flips a row to `modified`. Narrow on purpose:
    * these are the fields the reference's history DB trends track (size,
    * ownership, mtime, replication, permissions). */
  val tracked: Seq[String] =
    Seq("fileSize", "modTime", "user", "permission", "fileReplica")

  /** Per-inode change set between `before` and `after`: one row per inode
    * that was added, deleted, or modified (tracked columns), with byte
    * deltas. Unchanged inodes are dropped inside the join. */
  def diff(before: DataFrame, after: DataFrame): DataFrame = {
    def narrow(df: DataFrame, p: String) = df.select(
      col("id").as(p + "id"), col("path").as(p + "path"),
      col("user").as(p + "user"), col("parent").as(p + "parent"),
      col("isFile").as(p + "isFile"), col("fileSize").as(p + "bytes"),
      col("modTime").as(p + "modTime"), col("permission").as(p + "perm"),
      col("fileReplica").as(p + "repl"))
    val a = narrow(before, "a_")
    val b = narrow(after, "b_")
    val changed = // null-safe inequality on any tracked column
      !(col("a_bytes") <=> col("b_bytes")) ||
        !(col("a_modTime") <=> col("b_modTime")) ||
        !(col("a_user") <=> col("b_user")) ||
        !(col("a_perm") <=> col("b_perm")) ||
        !(col("a_repl") <=> col("b_repl"))
    a.join(b, col("a_id") === col("b_id"), "full_outer")
      .withColumn("change",
        when(col("a_id").isNull, "added")
          .when(col("b_id").isNull, "deleted")
          .when(changed, "modified"))
      .where(col("change").isNotNull)
      .select(
        coalesce(col("b_id"), col("a_id")).as("id"),
        col("change"),
        coalesce(col("b_path"), col("a_path")).as("path"),
        coalesce(col("b_user"), col("a_user")).as("user"),
        coalesce(col("b_parent"), col("a_parent")).as("parent"),
        coalesce(col("b_isFile"), col("a_isFile")).as("isFile"),
        coalesce(col("a_bytes"), lit(0L)).as("bytesBefore"),
        coalesce(col("b_bytes"), lit(0L)).as("bytesAfter"),
        (coalesce(col("b_bytes"), lit(0L)) - coalesce(col("a_bytes"), lit(0L)))
          .as("bytesDelta"))
  }

  /** Per-user growth attribution over a [[diff]] output (file rows only):
    * who added/deleted/modified how many files and how many bytes. One
    * small groupBy over the already-bounded diff. */
  def growthByUser(d: DataFrame): DataFrame =
    d.where(col("isFile"))
      .groupBy(col("user"))
      .agg(
        sum(when(col("change") === "added", 1L).otherwise(0L)).as("filesAdded"),
        sum(when(col("change") === "deleted", 1L).otherwise(0L)).as("filesDeleted"),
        sum(when(col("change") === "modified", 1L).otherwise(0L)).as("filesModified"),
        sum(when(col("change") === "added", 1L)
          .when(col("change") === "deleted", -1L).otherwise(0L)).as("filesDelta"),
        sum(col("bytesDelta")).as("bytesDelta"))

  /** Per-directory growth at `depth` (prefix projection — no ancestor
    * explode; the dir key is a `substring_index` of the changed file's own
    * path). Only files strictly below a depth-`depth` directory count. */
  def growthByDir(d: DataFrame, depth: Int): DataFrame =
    d.where(col("isFile") && size(split(col("path"), "/")) - 1 > depth)
      .groupBy(substring_index(col("path"), "/", depth + 1).as("dirPath"))
      .agg(
        sum(when(col("change") === "added", 1L)
          .when(col("change") === "deleted", -1L).otherwise(0L)).as("filesDelta"),
        sum(col("bytesDelta")).as("bytesDelta"),
        sum(when(col("change") === "modified", 1L).otherwise(0L)).as("filesModified"))
}
