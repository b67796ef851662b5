package graft.plans

import org.apache.spark.sql.SparkSession

/** Tuning seam for Spark's runtime bloom-filter injection
  * (`InjectRuntimeFilter`): when one side of a shuffled equi-join
  * carries a selective predicate, the optimizer builds a bloom filter
  * over that side's join keys and applies it to the other side's scan —
  * a semi-join pushdown that drops non-matching probe rows BEFORE the
  * shuffle, which at 100 TB is the difference between shuffling the
  * whole fact table and shuffling only the rows a filtered dimension
  * can actually match.
  *
  * Spark enables the rule by default but gates the probe side behind a
  * 10 GB scan-size threshold
  * (`spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`)
  * — correct at warehouse scale, where the filter's build cost must be
  * amortized, but it means plans validated at test scale silently run a
  * DIFFERENT shape than production. These helpers pin each regime
  * explicitly so ScaleBench can measure both and assert the filter
  * fires where intended (plan shows `bloom_filter_agg` on the build
  * side and `might_contain` in the probe-side scan filter).
  */
object RuntimeFilters {

  /** Production posture at the 100 TB design point: thresholds sized so
    * a fact-scale probe side (≫ creation side) triggers injection, with
    * room for billion-key dimension filters. */
  def enable(spark: SparkSession,
             probeSideMinBytes: Long = 64L << 20,
             buildSideMaxBytes: Long = 1L << 30,
             expectedItems: Long = 4000000L): Unit = {
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      probeSideMinBytes.toString)
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      buildSideMaxBytes.toString)
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
      expectedItems.toString)
  }

  def disable(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
}
