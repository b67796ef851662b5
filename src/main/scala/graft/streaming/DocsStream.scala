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
}
