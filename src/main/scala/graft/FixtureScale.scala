package graft

import org.apache.spark.sql.functions._

/** Dev scaling probe (NOT part of the driver contract): the sf0.1 bench
  * cannot tell a data-path win from a driver-overhead win — its heavy
  * fixture queries run ~1 at 8c/32c core ratio (r18 PERF), i.e. they
  * measure per-action scheduling, not the engine. This main materializes
  * a `scale`×-sf0.1 copy of the two pipeline tables (id-offset unions —
  * deterministic) and times the top store/lifecycle fixture queries on
  * it at `local[$SPARK_GRAFT_CPUS]`, so running it at 8 and at 32 cores
  * measures how the SAME declared query code scales with cores once the
  * data is big enough to matter. Results recorded in SCALING.md.
  *
  * `SPARK_GRAFT_CPUS=8|32 sbt "runMain graft.FixtureScale [scale] [dir]
  * [query ...]"`
  */
object FixtureScale {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = args.drop(1).headOption
      .getOrElse(s"/tmp/graft_fixture${scale}x")
    val queries = if (args.length > 2) args.drop(2).toSeq else Seq(
      "ann_cutover_live", "retrieval_hybrid_pq_store",
      "retrieval_hybrid_store_batch", "retrieval_hybrid_pq_batch_filtered",
      "retrieval_bm25_tailer")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    // materialize the scaled tables once; reruns (the second core count)
    // reuse them so both runs time identical bytes
    val marker = new java.io.File(s"$outDir/.complete_$scale")
    if (!marker.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
      val src = "/root/testdata/sf0.1"
      def scaled(name: String, idCol: String): Unit = {
        val base = spark.read.parquet(s"$src/$name.parquet")
        (0 until scale).map(c => base.withColumn(idCol,
            col(idCol) + lit(c.toLong * 100000000L)))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      }
      scaled("documents", "doc_id")
      scaled("embeddings", "vec_id")
      marker.getParentFile.mkdirs()
      marker.createNewFile()
      ()
    }
    graft.core.Tables.invalidateSchemaCache(Some(outDir))

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    queries.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map(_ => secs(fn(spark, outDir).count()))
      // hygiene between queries, the Bench discipline
      spark.sparkContext.getPersistentRDDs.foreach { case (_, rdd) =>
        if (!org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(rdd))
          rdd.unpersist(blocking = true)
      }
      System.gc()
      val s = times.sorted
      println(f"FIXTURESCALE $name cpus=$cpus scale=${scale}x " +
        f"median=${s(1)}%.2f min=${s.head}%.2f max=${s.last}%.2f")
    }
    spark.stop()
  }
}
