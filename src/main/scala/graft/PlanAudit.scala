package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints `explain("formatted")` for representative
  * queries so pushdown / pruning / codegen spans can be inspected.
  * Not part of the driver contract; run manually.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // args after the sf dir override the default target list (dev loop)
    val defaultTargets = Seq(
      "q1_pricing",            // pushdown: shipdate filter must reach the scan
      "nna_filter_count",      // column pruning through the inode derivation
      "nna_histogram_user",    // partial agg + single shuffle expected
      "q3_top_orders",         // join strategy: broadcast for dims
      "ann_bruteforce_top5",   // broadcast nested loop over corpus scan
      "ann_ivf_top5",          // cell assignment: NO exchange above the scan
      "nna_ingest_oiv",        // OIV ingest: CSV scan + two linear shuffles
      "dedup_minhash_lsh",     // banded join: only (band,hash,id) shuffles
      "nna_under_ns_quota",    // narrow ancestor walk: 16-byte shuffle rows
      "nna_histogram_user_salted") // two-phase salted group-by
    val targets = if (args.length > 1) args.drop(1).toSeq else defaultTargets
    targets.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
