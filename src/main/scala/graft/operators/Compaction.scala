package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Small-files compaction planner — the other half of the layout story
  * next to [[ZOrder]]: a 100 TB table accumulates millions of sub-target
  * files (streaming sinks, per-partition writes), and every scan then
  * pays per-file open/footer costs that dwarf the data read. The
  * OPTIMIZE/compact job first needs a PLAN: which files merge into which
  * target-sized output group.
  *
  * `plan` assigns each file a bin = `floor(bytes_before_file / target)`
  * under a deterministic global order — the same distributed two-phase
  * prefix sum as `Curation.packBins` (per-hash-bucket cumsum in
  * parallel, then a bounded per-bucket offset table; no global
  * single-task window), so the planner itself scales to any file count.
  * Compaction does not need path adjacency — groups merge arbitrarily —
  * so the hash-bucket order is fine, and every bin's fill lands in
  * (target − maxFile, target + maxFile).
  *
  * `filesOf` lists a directory driver-side (what Spark's own FileIndex
  * does); at lakehouse scale the (file, bytes) frame comes from the
  * table format's manifest instead — the distributed part is the plan.
  */
object Compaction {

  /** (file, bytes) frame for a directory of data files. Recurses so a
    * partitioned table (data under `k=v/` subdirectories) yields its
    * full manifest instead of a silently-empty plan; hidden files and
    * anything under a hidden/metadata directory (`_`/`.` prefix, e.g.
    * `_delta_log`, `.staging`) are excluded by path segment. */
  def filesOf(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.getFileStatus(p).getPath.toUri.getPath // normalized
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      val rel = s.getPath.toUri.getPath.stripPrefix(root).stripPrefix("/")
      val hidden = rel.split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (s.isFile && !hidden) buf += ((s.getPath.toString, s.getLen))
    }
    buf.toSeq.toDF("file", "bytes")
  }

  /** Assign every file to a compaction bin of ~`targetBytes`. */
  def plan(files: DataFrame, targetBytes: Long,
           nBuckets: Int = 64): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val keyed = files
      .withColumn("__h", graft.pipeline.Dedup.portableHash(
        concat(lit("compact:"), col("file"))))
      .withColumn("__b", pmod(col("__h"), lit(nBuckets.toLong)))
    val inBucket = Window.partitionBy("__b")
      .orderBy(col("__h").asc, col("file").asc)
    val local = keyed.withColumn("__cum",
      sum(col("bytes")).over(inBucket) - col("bytes"))
    val offsets = keyed.groupBy(col("__b"))
      .agg(sum(col("bytes")).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__b").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    local.join(broadcast(offsets), Seq("__b"))
      // integer `div`, not floor(/): long÷long rides double division and
      // drifts once the running byte total passes 2^53 (~9 PB manifests)
      .withColumn("bin",
        expr(s"(__cum + __off) div ${targetBytes}L").cast("long"))
      .select(col("file"), col("bytes"), col("bin"))
  }

  /** Per-bin fill summary of a [[plan]] — what the compact job's
    * scheduler sizes its tasks from. */
  def planSummary(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("fill_bytes"))
      .orderBy(col("bin"))
}
