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

  /** The signature-index version `indexDir`'s CURRENT pointer names, if
    * any — the index other jobs (backfills, audits) should join against. */
  def currentIndex(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val current = new java.io.File(indexDir, "CURRENT")
    if (!current.exists()) None
    else Some(spark.read.parquet(new java.io.File(indexDir,
      new String(java.nio.file.Files.readAllBytes(current.toPath),
        "UTF-8").trim).toString))
  }

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
        val root = new java.io.File(indexDir)
        root.mkdirs()
        val currentFile = new java.io.File(root, "CURRENT")
        val currentVersion =
          if (currentFile.exists())
            Some(new String(java.nio.file.Files.readAllBytes(
              currentFile.toPath), "UTF-8").trim)
          else None
        val vNew = s"v$batchId"
        if (!currentVersion.contains(vNew)) {
          val keptSigs = currentVersion match {
            case Some(v) =>
              spark.read.parquet(new java.io.File(root, v).toString)
            case None => spark.emptyDataFrame
              .select(lit(0L).as("did"),
                array().cast("array<bigint>").as("sig"))
          }
          val (kept, index) = graft.pipeline.Dedup.incrementalDedup(
            batch.select("doc_id", "text", "lang", "source", "n_chars"),
            "doc_id", col("text"), keptSigs, shingleN, perms,
            thresholdPpm = thresholdPpm, bands = bands)
          kept.write.mode("overwrite").parquet(s"$keptDir/batch=$batchId")
          index.write.mode("overwrite")
            .parquet(new java.io.File(root, vNew).toString)
          val tmp = new java.io.File(root, "CURRENT.tmp")
          java.nio.file.Files.write(tmp.toPath, vNew.getBytes("UTF-8"))
          java.nio.file.Files.move(tmp.toPath, currentFile.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          // stale versions cleaned only AFTER the swap — best-effort
          // sweep of every non-current version, so a crash mid-cleanup
          // strands nothing past the next successful batch
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(); ()
          }
          root.listFiles().filter(f => f.isDirectory &&
            f.getName.startsWith("v") && f.getName != vNew).foreach(rm)
        }
        ()
      }
      .start()
}
