package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingestion + dedup over the `documents` table shape — the
  * "dedup at the door" pattern of a continuously-fed training corpus:
  * drop exact duplicates as documents arrive instead of re-scanning the
  * corpus after the fact.
  *
  * State discipline at scale: `dropDuplicatesWithinWatermark` keeps ONE
  * fingerprint per state key and expires keys past the watermark horizon,
  * so state is bounded by (arrival rate × watermark), not corpus size.
  * A plain `dropDuplicates` on an unbounded stream grows state forever —
  * at corpus-firehose rates that is an executor OOM by design. Pair with
  * [[EventsStream.rocksDbSession]] so state spills to disk.
  */
object DocsStream {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File stream over a documents directory. Arrival time is synthesized
    * deterministically from doc_id (the fixture carries no event time);
    * a production feed supplies its own ingestion timestamp column. */
  def readDocs(spark: SparkSession, dir: String,
               epochMs: Long = 1700000000000L): DataFrame =
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .withColumn("arrival",
        timestamp_millis(lit(epochMs) + col("doc_id") * 1000L))

  /** Keep the first arrival of each content fingerprint inside the
    * watermark horizon; later exact copies are dropped in-flight. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", md5(lower(trim(col("text")))))
      .withWatermark("arrival", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  // ---- versioned-index plumbing, routed through the Hadoop FS layer so
  // indexDir may live on HDFS/S3A exactly like the parquet data (a
  // java.io.File CURRENT on a non-local URI would silently never be
  // found and every batch would dedup against an empty index) ----

  private def hadoopFs(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Version name in the CURRENT pointer, if any.
    *
    * Concurrent-swap tolerance: [[swapPointer]]'s rename is atomic for
    * the pointer FILE, but on a checksummed FS (the local
    * ChecksumFileSystem; HDFS verifies server-side) the `.crc` sidecar
    * moves in its own step, so a reader racing a swap can catch the
    * gap as a ChecksumException on a perfectly good pointer — the
    * cutover spec's live feed hit exactly this. A bounded retry reads
    * the settled pair; the exception still surfaces if the file is
    * genuinely corrupt (it keeps failing after the swap window). */
  def readPointer(spark: SparkSession, indexDir: String): Option[String] = {
    val (fs, root) = hadoopFs(spark, indexDir)
    val cur = new org.apache.hadoop.fs.Path(root, "CURRENT")
    var attempt = 0
    while (attempt < 20) {
      attempt += 1
      try {
        if (fs.exists(cur)) {
          val in = fs.open(cur)
          val buf = new java.io.ByteArrayOutputStream()
          try org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096,
            false)
          finally in.close()
          return Some(new String(buf.toByteArray, "UTF-8").trim)
        }
        // absent: EITHER no pointer yet OR a swap's delete-then-rename
        // gap (the local FS's rename-with-overwrite deletes the
        // destination first). A short settle distinguishes them: the
        // gap is microseconds; a genuinely absent pointer stays absent
        // and returns None after the bounded retries.
        Thread.sleep(10)
      } catch {
        case e: org.apache.hadoop.fs.ChecksumException =>
          // a reader racing the swap can catch the data/.crc sidecar
          // gap on a perfectly good pointer; genuinely corrupt files
          // keep failing and surface after the retries
          if (attempt >= 20) throw e
          Thread.sleep(10)
        case _: java.io.FileNotFoundException =>
          // exists() raced the delete half of the swap
          Thread.sleep(10)
      }
    }
    if (fs.exists(cur)) {
      val in = fs.open(cur)
      val buf = new java.io.ByteArrayOutputStream()
      try org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      finally in.close()
      Some(new String(buf.toByteArray, "UTF-8").trim)
    } else None
  }

  /** Atomically point CURRENT at `version`: write a temp file, rename with
    * OVERWRITE via `FileContext` (atomic on HDFS and the local FS — a
    * plain `FileSystem.rename` refuses an existing destination). */
  def swapPointer(spark: SparkSession, indexDir: String,
                  version: String): Unit = {
    val (fs, root) = hadoopFs(spark, indexDir)
    val tmp = new org.apache.hadoop.fs.Path(root, "CURRENT.tmp")
    val cur = new org.apache.hadoop.fs.Path(root, "CURRENT")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(root.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, cur, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Best-effort sweep of non-current versioned dirs matching `prefix`. */
  def sweepStale(spark: SparkSession, indexDir: String, keep: String,
                 prefix: String = "v"): Unit = {
    val (fs, root) = hadoopFs(spark, indexDir)
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(prefix) && n != keep)
        fs.delete(st.getPath, true)
    }
    ()
  }

  /** The signature-index version `indexDir`'s CURRENT pointer names, if
    * any — the index other jobs (backfills, audits) should join against. */
  def currentIndex(spark: SparkSession, indexDir: String): Option[DataFrame] =
    readPointer(spark, indexDir).map(v =>
      spark.read.parquet(s"$indexDir/$v"))

  /** Streaming NEAR-dedup at the door: each microbatch runs
    * [[graft.pipeline.Dedup.incrementalDedup]] against the persisted
    * MinHash signature index — batch N+1 sees every document batch N kept,
    * exactly like the batch `dedup_incremental` path applied per arrival.
    *
    * The index lives as parquet under `indexDir` (NOT in the state store):
    * signatures are corpus-sized — per-key streaming state would rebuild
    * the corpus in RocksDB; as a parquet side-input the per-batch cost is
    * one band-table scan of the index, and the index doubles as the
    * batch-side artifact other jobs (e.g. backfills) join against
    * ([[currentIndex]]).
    *
    * Crash contract: the index is VERSIONED (`v<batchId>/` dirs) behind an
    * atomically-replaced `CURRENT` pointer file, so a crash at ANY point
    * leaves the pointer on a complete index (old or new) and at most one
    * batch replays. Survivors land in per-batch dirs (`batch=<id>/`,
    * overwrite mode) so a replay rewrites its own output instead of
    * appending duplicates; a batch whose pointer swap already landed is
    * detected and skipped entirely (rerunning it against the NEW index
    * would flag the batch's own survivors as duplicates and overwrite the
    * kept dir with an empty set). */
  def nearDedupStream(docs: DataFrame, indexDir: String, keptDir: String,
                      checkpointDir: String, shingleN: Int = 3,
                      perms: Int = 64, bands: Int = 8,
                      thresholdPpm: Long = 900000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val currentVersion = readPointer(spark, indexDir)
        val vNew = s"v$batchId"
        if (!currentVersion.contains(vNew)) {
          val keptSigs = currentVersion match {
            case Some(v) => spark.read.parquet(s"$indexDir/$v")
            case None => spark.emptyDataFrame
              .select(lit(0L).as("did"),
                array().cast("array<bigint>").as("sig"))
          }
          val (kept, index) = graft.pipeline.Dedup.incrementalDedup(
            batch.select("doc_id", "text", "lang", "source", "n_chars"),
            "doc_id", col("text"), keptSigs, shingleN, perms,
            thresholdPpm = thresholdPpm, bands = bands)
          kept.write.mode("overwrite").parquet(s"$keptDir/batch=$batchId")
          index.write.mode("overwrite").parquet(s"$indexDir/$vNew")
          swapPointer(spark, indexDir, vNew)
          // stale versions cleaned only AFTER the swap — best-effort
          // sweep of every non-current version, so a crash mid-cleanup
          // strands nothing past the next successful batch
          sweepStale(spark, indexDir, keep = vNew)
        }
        ()
      }
      .start()

  /** Streaming maintenance of the IVF cell-assignment index: each
    * microbatch of embeddings is assigned to its coarse cell — the same
    * shuffle-free codegen'd projection as the batch
    * [[graft.pipeline.Similarity.ivfAssign]] — and APPENDED as a delta
    * (`delta_b<id>/`, overwrite mode so a replayed batch rewrites itself);
    * every `compactEvery` batches the base + deltas compact into one new
    * versioned base behind the same atomically-swapped CURRENT pointer as
    * [[nearDedupStream]]. Centroids are FIXED at stream start — the
    * production pattern (the coarse quantizer trains offline; retraining
    * is a new index, not an in-place mutation), which is also what keeps
    * per-batch work a projection: no shuffle, no state store, state size
    * zero. ANN queries serve from base ∪ deltas ([[currentIvfIndex]]) and
    * are never blocked by compaction. */
  def ivfAssignStream(emb: DataFrame, cents: Seq[(Long, Array[Double])],
                      indexDir: String, checkpointDir: String,
                      compactEvery: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val assigned = batch.select(
          element_at(graft.functions.NearestCentroids.nearest_centroids(
            col("embedding"), cents, 1), 1).as("cell"),
          col("vec_id"))
        assigned.write.mode("overwrite")
          .parquet(s"$indexDir/delta_b$batchId")
        if (batchId % compactEvery == (compactEvery - 1).toLong) {
          val vNew = s"v$batchId"
          if (!readPointer(spark, indexDir).contains(vNew)) {
            currentIvfIndex(spark, indexDir).foreach { all =>
              all.write.mode("overwrite").parquet(s"$indexDir/$vNew")
              swapPointer(spark, indexDir, vNew)
              sweepStale(spark, indexDir, keep = vNew)
              // deltas folded into the new base are swept LAST: a crash
              // before this point serves (new base ∪ old deltas) — vec_ids
              // appear twice but with identical cells, and the next
              // compaction re-dedups by (cell, vec_id)
              sweepStale(spark, indexDir, keep = "", prefix = "delta_b")
            }
          }
        }
        ()
      }
      .start()

  /** The queryable IVF assignment set: compacted base (CURRENT) ∪ live
    * deltas, distinct on (cell, vec_id) — duplicates can exist only as
    * identical rows in the crash window between base write and delta
    * sweep. */
  def currentIvfIndex(spark: SparkSession,
                      indexDir: String): Option[DataFrame] = {
    val (fs, root) = hadoopFs(spark, indexDir)
    if (!fs.exists(root)) return None
    val deltas = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("delta_b"))
      .map(_.getPath.toString)
    val base = readPointer(spark, indexDir)
      .map(v => spark.read.parquet(s"$indexDir/$v"))
    val parts = base.toSeq ++ deltas.toSeq.sorted.map(spark.read.parquet(_))
    if (parts.isEmpty) None
    else Some(parts.reduce(_ unionByName _).distinct())
  }
}
