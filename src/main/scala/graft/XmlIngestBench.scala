package graft
import org.apache.spark.sql.functions._

/** Scale-stress bench for the XML (full-fidelity) ingest path: generate an
  * image with `python3 tools/gen_fsimage_xml.py <n_files> /tmp/fsimage_big`,
  * then `sbt "runMain graft.XmlIngestBench /tmp/fsimage_big.xml"`. The
  * interesting stage is path reconstruction — the per-level join loop over
  * the parent/child id links — which the Delimited path never pays.
  */
object XmlIngestBench {
  def main(args: Array[String]): Unit = {
    val image = args.headOption.getOrElse("/tmp/fsimage_big.xml")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"XMLINGESTBENCH $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    t("resolve_paths_only") {
      val raw = graft.ingest.FsImageXmlSource.readInodes(spark, image)
      val links = graft.ingest.FsImageXmlSource.readDirLinks(spark, image)
      graft.ingest.FsImageXmlSource.resolvePaths(spark, raw, links).count()
    }
    val loc = s"oivxml:$image"
    t("ingest+persist+count") {
      graft.inodes.InodeView.snapshot(spark, loc).count()
    }
    t("storage_histogram") {
      graft.engine.Histograms.histogram(
        graft.inodes.InodeView.snapshot(spark, loc).where(col("isFile")),
        graft.engine.Fields.stringField("storageType"), count(lit(1))).count()
    }
    t("under_ns_quota") {
      graft.engine.PathStructure.underQuota(
        graft.inodes.InodeView.snapshot(spark, loc), "nsQuota")
        .where(col("isFile")).count()
    }
    // optional 2nd arg: a BINARY image of the same namespace
    // (tools/gen_fsimage_bin.py <flat_csv> <out.bin>) — times the direct
    // front door: sequential container decode + the same derivation
    args.drop(1).headOption.foreach { bin =>
      t("bin_decode_only") {
        graft.ingest.FsImageBinary.readInodesFull(bin).length
      }
      t("bin_ingest+persist+count") {
        graft.inodes.InodeView.snapshot(spark, s"oivbin:$bin").count()
      }
    }
    spark.stop()
  }
}
