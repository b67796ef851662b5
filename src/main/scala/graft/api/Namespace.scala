package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.inodes.InodeView

/** Namespace persistence — the reference's save/fetch/reload admin surface
  * (S5: `saveNamespace`/`fetchNamespace`/`reloadNamespace`,
  * `NamenodeAnalyticsMethods.java:1140-1235`, `NameNodeLoader.java:279-307`).
  * Spark analog: write the snapshot as parquet (legacy-format flag in the
  * reference ↔ format choice here), reload by re-reading.
  */
object Namespace {

  /** Persist the current snapshot (reference `/saveNamespace`). */
  def save(inodes: DataFrame, path: String, format: String = "parquet"): Unit =
    inodes.write.mode(SaveMode.Overwrite).format(format).save(path)

  /** Load a saved namespace image (reference bootstrap-from-image). */
  def load(spark: SparkSession, path: String, format: String = "parquet"): DataFrame =
    spark.read.format(format).load(path)

  /** Drop + rebuild the derived snapshot (reference `/reloadNamespace`). */
  def reload(spark: SparkSession, dir: String): DataFrame = {
    InodeView.invalidate(dir)
    InodeView.snapshot(spark, dir)
  }

  /** Persist the namespace BUCKETED on a join/group key (saved as a table —
    * bucketing metadata lives in the catalog). Queries keyed on the bucket
    * column then run with NO exchange: the scan already provides the hash
    * distribution, so per-directory aggregations (`dirNumChildren`-style
    * `groupBy(parent)`) and parent-keyed self-joins skip their shuffle —
    * the "reuse a partitioning across stages" play for hot namespace keys
    * at cluster scale. */
  def saveBucketed(inodes: DataFrame, table: String, bucketCol: String,
                   buckets: Int = 32): Unit =
    inodes.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)
}
