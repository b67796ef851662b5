package graft

import org.apache.spark.sql.functions._

/** One-off probe: where does `oivxml:` derive time go at scale? */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val image = args.headOption.getOrElse("/tmp/fsimage_2m.xml")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"INGESTPROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    import graft.ingest.FsImageXmlSource._
    var raw: org.apache.spark.sql.DataFrame = null
    var links: org.apache.spark.sql.DataFrame = null
    t("parse_checkpoint") {
      // public surface parses raw records; the probe re-derives the
      // normalized fields it needs inline (normalize is private)
      raw = readInodes(spark, image)
        .select(col("id"), col("type"), col("name"),
          coalesce(aggregate(col("blocks.block"), lit(0L),
            (acc, b) => acc + b("numBytes")), lit(0L)).as("fileSize"),
          coalesce(col("replication"), lit(0L)).as("fileReplica"),
          col("ecPolicyId").isNotNull.as("hasEc"))
        .localCheckpoint(true)
      links = readDirLinks(spark, image).localCheckpoint(true)
      raw.count()
    }
    var paths: org.apache.spark.sql.DataFrame = null
    t("resolve_paths") {
      paths = resolvePaths(spark, raw, links)
      paths.count()
    }
    val pathsCk = paths.localCheckpoint(true)
    t("base_join") { raw.join(pathsCk, Seq("id")).count() }
    val base = raw.join(pathsCk, Seq("id"))
      .select(col("path"), col("type") === "FILE" as "isFile",
        col("fileSize"), col("fileReplica"),
        col("hasEc").as("hasEcPolicy"))
    t("usage_explode_agg") {
      graft.engine.PathStructure.withAncestors(base)
        .groupBy(col("ancestor")).agg(count(lit(1)).as("n")).count()
    }
    t("children_agg") {
      links.groupBy(col("parentId")).agg(count(lit(1))).count()
    }
    t("full_derive_count") {
      graft.ingest.FsImageXmlSource.inodes(spark, image).count()
    }
    t("full_snapshot_persist") {
      graft.inodes.InodeView.snapshot(spark, s"oivxml:$image").count()
    }
    spark.stop()
  }
}
