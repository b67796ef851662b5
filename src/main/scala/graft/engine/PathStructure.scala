package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two path-structural "joins" of the reference (SURVEY §7.4.1–2):
  * quota-ancestry flags and recursive subtree aggregation. Both are
  * implemented as ancestor-prefix explodes + one shuffle — set-at-a-time,
  * instead of the reference's per-inode ancestor walk
  * (`AbstractQueryEngine.java:350-375`) and per-dir recursive ContentSummary
  * (`VersionContext.java:125-175`, which the reference itself warns is
  * expensive).
  *
  * Scale: `ancestors` explodes each path into ≤depth prefixes (HDFS depth is
  * small, ~≤20), so the explode is a constant-factor map; the semi-join
  * against the quota-dir set broadcasts (quota dirs ≪ files), and subtree
  * aggregation for ALL dirs costs one shuffle total.
  */
object PathStructure {

  /** Explode `path` into its proper-ancestor directory prefixes
    * (excluding root and self — the reference checks ancestors only,
    * excluding root, `AbstractQueryEngine.java:356-366`). */
  def withAncestors(df: DataFrame): DataFrame = {
    // "/a/b/c" → ["/a", "/a/b"]: build prefixes by re-joining split parts.
    // Guard size > 2: sequence(2, 1) would DESCEND and include self.
    df.withColumn("ancestor",
      explode(expr(
        "CASE WHEN size(split(path, '/')) > 2 THEN " +
        "transform(sequence(2, size(split(path, '/')) - 1), " +
        "i -> array_join(slice(split(path, '/'), 1, i), '/')) " +
        "ELSE array() END")))
  }

  /** Flag inodes that sit under any directory with the given quota kind.
    * `quotaField` ∈ {nsQuota, dsQuota}. Broadcast semi-join against the
    * (small) quota-dir set. */
  def underQuota(inodes: DataFrame, quotaField: String): DataFrame = {
    val quotaDirs = inodes
      .where(!col("isFile") && col(quotaField) >= 0)
      .select(col("path").as("ancestor"))
    withAncestors(inodes)
      .join(broadcast(quotaDirs), Seq("ancestor"), "left_semi")
      .dropDuplicates("id")
      .drop("ancestor")
  }

  /** Subtree stats for EVERY directory in one shuffle: explode file ancestor
    * prefixes → group by ancestor. Returns (path, dirSubTreeSize,
    * dirSubTreeNumFiles). */
  def subtreeStats(inodes: DataFrame): DataFrame = {
    val files = inodes.where(col("isFile")).select(col("path"), col("fileSize"))
    withAncestors(files)
      .groupBy(col("ancestor").as("path"))
      .agg(
        sum("fileSize").as("dirSubTreeSize"),
        count(lit(1)).as("dirSubTreeNumFiles"))
  }

  /** Subtree dir counts (proper descendants that are dirs). */
  def subtreeDirCounts(inodes: DataFrame): DataFrame = {
    val dirs = inodes.where(!col("isFile")).select(col("path"))
    withAncestors(dirs)
      .groupBy(col("ancestor").as("path"))
      .agg(count(lit(1)).as("dirSubTreeNumDirs"))
  }
}
