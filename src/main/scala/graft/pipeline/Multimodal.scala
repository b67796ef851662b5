package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode/feature/frame-sample operator
  * surface a training-data pipeline needs.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): [[stubDecodeFeatures]] is a clearly-marked deterministic fake.
  * Everything around it — schema, batch shape, partition-parallel operation,
  * frame slicing arithmetic — is real Spark and tested. Swapping the stub
  * for a real decoder means replacing one expression with a Pandas-UDF /
  * JNI call of the same signature; the plan shape does not change.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),  // opaque payload
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Build a deterministic synthetic asset table from the documents table
    * (payload = utf8 bytes of the text) — the test double for binary media. */
  def syntheticAssets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("doc_id") % 1920 + 1).cast("int").as("width"),
        (col("doc_id") % 1080 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms"),
        lit("stub").as("codec")).as("meta"))

  /** STUB decode → feature vector. A real implementation decodes the media
    * and runs a feature extractor; this deterministic fake derives `dims`
    * doubles from content bytes so downstream plumbing (schema, joins, ANN
    * over features) is exercised end-to-end. Hashing is the portable
    * md5-parse scheme ([[Dedup.portableHash]]) over `content ++ ":i"`, so
    * the fake features — and everything computed from them — are
    * oracle-checkable in SQL; the literal array also keeps the projection
    * out of interpreted higher-order functions. */
  def stubDecodeFeatures(content: Column, dims: Int = 8): Column =
    array((0 until dims).map { i =>
      (conv(substring(md5(concat(content, encode(lit(s":$i"), "UTF-8"))),
        1, 15), 16, 10).cast("long") % 1000000L).cast("double") / 1000000.0
    }: _*)

  /** Frame sampling for video/audio payloads: slice the binary into `n`
    * evenly-spaced windows of `frameBytes` bytes. Pure byte arithmetic —
    * the real decoder would seek by timestamp instead; the partition-
    * parallel explode shape is identical. */
  def sampleFrames(df: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    val totalLen = length(col("content"))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * greatest(
          (totalLen - frameBytes) / math.max(n - 1, 1), lit(1))).cast("int"))
      .withColumn("frame",
        expr(s"substring(content, frame_offset + 1, $frameBytes)"))
      .where(length(col("frame")) > 0)
  }

  /** Resize stub for images: records target dims + a content-derived hash
    * as the "resized" payload fingerprint (real impl: decode→scale→encode). */
  def stubResize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("resized_meta",
        struct(lit(w).as("width"), lit(h).as("height")))
      .withColumn("resized_fingerprint", xxhash64(col("content"), lit(w), lit(h)))
}
