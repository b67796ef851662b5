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

  /** Streaming NEAR-dedup at the door: each microbatch runs
    * [[graft.pipeline.Dedup.incrementalDedup]] against the persisted
    * MinHash signature index — batch N+1 sees every document batch N kept,
    * exactly like the batch `dedup_incremental` path applied per arrival.
    *
    * The index lives as parquet at `indexDir` (NOT in the state store):
    * signatures are corpus-sized — per-key streaming state would rebuild
    * the corpus in RocksDB; as a parquet side-input the per-batch cost is
    * one band-table scan of the index, and the index doubles as the
    * batch-side artifact other jobs (e.g. backfills) join against.
    * Survivors append to `keptDir`; both writes are driver-coordinated
    * per microbatch (foreachBatch), so a crash replays at most one batch
    * (idempotent per `batchId` guard left to the caller's sink contract).
    */
  def nearDedupStream(docs: DataFrame, indexDir: String, keptDir: String,
                      checkpointDir: String, shingleN: Int = 3,
                      perms: Int = 64, bands: Int = 8,
                      thresholdPpm: Long = 900000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existing = new java.io.File(indexDir).exists()
        val keptSigs =
          if (existing) spark.read.parquet(indexDir)
          else spark.emptyDataFrame
            .select(lit(0L).as("did"), array().cast("array<bigint>").as("sig"))
            .limit(0)
        val (kept, index) = graft.pipeline.Dedup.incrementalDedup(
          batch.select("doc_id", "text", "lang", "source", "n_chars"),
          "doc_id", col("text"), keptSigs, shingleN, perms, thresholdPpm = thresholdPpm,
          bands = bands)
        kept.write.mode("append").parquet(keptDir)
        // rewrite via temp + move: the new index reads the old one lazily,
        // so an in-place overwrite would clobber its own input mid-scan
        val tmp = indexDir + ".next"
        index.write.mode("overwrite").parquet(tmp)
        val target = new java.io.File(indexDir)
        if (existing) {
          val old = new java.io.File(indexDir + ".old")
          java.nio.file.Files.move(target.toPath, old.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.move(new java.io.File(tmp).toPath, target.toPath)
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(); ()
          }
          rm(old)
        } else {
          java.nio.file.Files.move(new java.io.File(tmp).toPath, target.toPath)
        }
        ()
      }
      .start()
}
