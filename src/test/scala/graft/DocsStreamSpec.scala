package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{DocsStream, EventsStream}

class DocsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("streamed exact dedup keeps the batch-distinct fingerprint set") {
    val streamed = EventsStream.runToMemory(spark,
      DocsStream.dedupStream(DocsStream.readDocs(spark, dir)), "docs_dedup")
    val streamedFps = streamed.select("fingerprint")
      .collect().map(_.getString(0)).toSeq
    val batchFps = graft.core.Tables.documents(spark, dir)
      .select(md5(lower(trim(col("text")))).as("fp"))
      .distinct().collect().map(_.getString(0)).toSet
    // one survivor per distinct fingerprint, covering the batch set exactly
    assert(streamedFps.size === streamedFps.toSet.size, "duplicate survived")
    assert(streamedFps.toSet === batchFps)
  }

  test("watermark expiry re-admits duplicates past the horizon (bounded state)") {
    import spark.implicits._
    // four single-file micro-batches; arrival = epoch + doc_id seconds
    // (readDocs's synthesis), watermark 1 hour. Batch N's end-of-batch
    // state cleanup uses the watermark computed from batch N-1's events,
    // so eviction lands one batch after the event that advances the clock:
    //   b1: "alpha" at t0          -> kept, state expires t0+1h
    //   b2: "beta"  at t0+50000s   -> kept (cleanup still at b1's watermark)
    //   b3: "gamma" at t0+55000s   -> kept; cleanup now at +46400s, evicts alpha
    //   b4: "alpha" at t0+60000s   -> state gone -> KEPT again
    // a corpus-lifetime dedup would emit alpha once; bounded state emits it
    // twice — that boundedness is the operator's scale contract
    val tmp = java.nio.file.Files.createTempDirectory("docsstream").toString
    def writeBatch(name: String, docId: Long, text: String, mtime: Long): Unit = {
      val staging = tmp + "/stage_" + name
      Seq((docId, text, "en", "src", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dest = java.nio.file.Paths.get(tmp, name + ".parquet")
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    writeBatch("b1", 0L, "alpha", 1000000L)
    writeBatch("b2", 50000L, "beta", 2000000L)
    writeBatch("b3", 55000L, "gamma", 3000000L)
    writeBatch("b4", 60000L, "alpha", 4000000L)
    val docs = spark.readStream.schema(DocsStream.schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "b*.parquet")
      .parquet(tmp)
      .withColumn("arrival",
        timestamp_millis(lit(1700000000000L) + col("doc_id") * 1000L))
    val out = EventsStream.runToMemory(spark,
      DocsStream.dedupStream(docs, "1 hour"), "docs_dedup_wm")
    val byText = out.groupBy("text").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byText === Map("alpha" -> 2L, "beta" -> 1L, "gamma" -> 1L))
  }

  test("in-horizon duplicates are dropped in-flight") {
    import spark.implicits._
    // 200 docs, 100 distinct texts, all within one hour: one survivor each
    val tmp = java.nio.file.Files.createTempDirectory("docsdup").toString
    (0L until 200L).map(i => (i, "text " + (i % 100), "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(tmp + "/in")
    val docs = spark.readStream.schema(DocsStream.schema)
      .parquet(tmp + "/in")
      .withColumn("arrival",
        timestamp_millis(lit(1700000000000L) + col("doc_id") * 1000L))
    val out = EventsStream.runToMemory(spark,
      DocsStream.dedupStream(docs, "1 hour"), "docs_dedup_flight")
    assert(out.count() === 100L)
    assert(out.select("text").distinct().count() === 100L)
  }
}
