package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.inodes.InodeView

/** What-if attribute transforms (SURVEY §2.6, `queries/Transforms.java:58-230`):
  * rewrite `fileReplica` to a hypothetical value for inodes matching a
  * condition, *before* aggregation. The rewrite fans out to the derived
  * attributes exactly like the reference (`Transforms.java:167-185`):
  * `fileReplica := out`, `numReplicas := numBlocks * out`,
  * `diskspaceConsumed := fileSize * out`; non-matching rows keep the
  * standard accessor (`:206-230`).
  *
  * Pure expression substitution — `when(cond, rewritten).otherwise(std)` —
  * no UDF, no second pass (the reference builds per-inode HashMaps).
  */
object Transforms {

  /** Returns a field-resolution function with the transform applied. */
  def transformedField(
      conditions: String, set: String, outputReplica: Long,
      now: Long = InodeView.NowMs): String => Column = {
    val cond = Filters.compileAll(conditions, set, now)
    (field: String) => field match {
      case "fileReplica" => when(cond, lit(outputReplica)).otherwise(col("fileReplica"))
      case "numReplicas" =>
        when(cond, col("numBlocks") * outputReplica)
          .otherwise(Fields.longField("numReplicas"))
      case "diskspaceConsumed" =>
        when(cond, col("fileSize") * outputReplica)
          .otherwise(Fields.longField("diskspaceConsumed"))
      case other => Fields.longField(other, now)
    }
  }
}
