package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for local debugging (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val ino = inodes.InodeView.inodes(spark, dir)
    val qd = ino.where(!col("isFile") && col("nsQuota") >= 0)
    println("quota dirs: " + qd.count())
    val filesUnder = ino.where(col("isFile"))
      .join(qd.select(col("path").as("parent")), Seq("parent"), "left_semi")
    println("files with quota parent: " + filesUnder.count())
    val anc = engine.PathStructure.withAncestors(ino.where(col("isFile")))
      .select("path", "ancestor")
    anc.show(6, false)
    println("underQuota: " + engine.PathStructure.underQuota(ino, "nsQuota")
      .where(col("isFile")).count())
    val fo = ino.where(col("isFile"))
    val anc2 = engine.PathStructure.withAncestors(fo)
    val semi = anc2.join(qd.select(col("path").as("ancestor")), Seq("ancestor"), "left_semi")
    println("semi rows: " + semi.count())
    println("semi distinct ids: " + semi.select("id").distinct().count())
    // which files are missing vs parent-join?
    val byParent = fo.join(qd.select(col("path").as("parent")), Seq("parent"), "left_semi")
    val missing = byParent.select("path").exceptAll(semi.select("path"))
    println("missing: " + missing.count())
    missing.show(5, false)
    spark.stop()
  }
}
