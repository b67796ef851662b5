package graft
import org.apache.spark.sql.SparkSession

/** Dev timing harness: cold + warm wall time for named queries.
  *
  * `Bench` times each query once, which folds codegen compilation and
  * first-file-read into the number; this tool separates that one-time cost
  * from steady-state throughput (the reference serves repeated interactive
  * queries against a loaded namespace, so warm time is the comparable
  * figure).
  *
  * Usage: `runMain graft.TimeQ <sfDir> <queryName> [queryName ...]`
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val snap = graft.inodes.InodeView.snapshot(spark, sfDir)
    snap.count()
    graft.engine.PathStructure.primeQuotaGates(snap)
    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    args.drop(1).foreach { name =>
      val t1 = secs(SparkEntry.queries(name)(spark, sfDir).count())
      val t2 = secs(SparkEntry.queries(name)(spark, sfDir).count())
      val t3 = secs(SparkEntry.queries(name)(spark, sfDir).count())
      println(f"TIMEQ $name%s cold=$t1%.2f warm=$t2%.2f warm2=$t3%.2f")
    }
    spark.stop()
  }
}
