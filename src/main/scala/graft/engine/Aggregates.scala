package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Whole-set aggregations: sums, global find, divide, contentSummary —
  * SURVEY §2.3 A1–A4, A10–A11.
  */
object Aggregates {

  /** Multi-sum in ONE pass (`sum=count,diskspaceConsumed,…`). The reference
    * loops the collection once per requested sum
    * (`NamenodeAnalyticsMethods.java:1448-1491`); a single `agg` with N
    * aggregates is one scan regardless of N. */
  def sums(df: DataFrame, sumFields: Seq[String]): DataFrame = {
    val aggs = sumFields.map {
      case "count" => count(lit(1)).as("count")
      case f       => sum(Fields.longField(f)).as(f)
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Global find: reduce the filtered set to the arg-min/arg-max inode
    * (`AbstractQueryEngine.java:470-498`; avg not allowed globally).
    * orderBy+limit(1) compiles to TakeOrdered — per-partition top-1 and a
    * driver merge, no full sort. Tiebreak: smallest id wins. */
  def findInode(df: DataFrame, op: String, field: String): DataFrame = {
    val v = Fields.longField(field)
    val sorted = op match {
      case "max" => df.orderBy(v.desc, col("id").asc)
      case "min" => df.orderBy(v.asc, col("id").asc)
      case other => throw new IllegalArgumentException(s"global find only min|max, got $other")
    }
    sorted.limit(1).select(col("path"), v.as("value"))
  }

  /** `/divide`: ratio of two independently filtered+summed sets
    * (`NamenodeAnalyticsMethods.java:1307-1393`). Emitted as micro-units
    * (ratio × 1e6, floored) so the oracle comparison is exact-integer. */
  def divide(num: DataFrame, numSum: Column, den: DataFrame, denSum: Column): DataFrame = {
    val n = num.agg(numSum.cast("double").as("n"))
    val d = den.agg(denSum.cast("double").as("d"))
    n.crossJoin(d).select(
      floor(lit(1000000.0) * col("n") / col("d")).cast("long").as("ratio_ppm"))
  }

  /** `contentSummary(path)`: recursive file/dir/byte counts under a path
    * (`NamenodeAnalyticsMethods.java:2012-2059`). One predicate-pushed scan. */
  def contentSummary(inodes: DataFrame, path: String): DataFrame = {
    val under = inodes.where(col("path").startsWith(path + "/") || col("path") === path)
    under.agg(
      sum(when(col("isFile"), 1L).otherwise(0L)).as("fileCount"),
      sum(when(!col("isFile"), 1L).otherwise(0L)).as("dirCount"),
      sum(when(col("isFile"), col("fileSize")).otherwise(0L)).as("length"),
      sum(when(col("isFile"), col("fileSize") * col("fileReplica"))
        .otherwise(0L)).as("spaceConsumed"))
  }
}
