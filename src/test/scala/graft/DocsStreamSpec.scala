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

  test("streaming near-dedup equals sequential batch incrementalDedup") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("docsnear").toString
    // two microbatches with near-dups across the batch boundary: b2's doc
    // 10 is a near-copy of b1's doc 1 (one token changed in 12) and must be
    // dropped AGAINST THE INDEX, not just within its own batch; doc 12
    // near-copies 11 within b2 (lower id wins); 2 and 13 are unique
    // 24 tokens; one mid-token swap → true Jaccard 19/25 = 0.76, ~5 sd
    // above the 0.50 threshold under the 64-perm MinHash estimator
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val b1 = Seq((1L, base), (2L, "one two three four five six seven"))
    val b2 = Seq(
      (10L, base.replace("zeta", "zetax")),
      (11L, "red green blue cyan magenta yellow black white gray pink"),
      (12L, "red green blue cyan magenta yellow black white gray rose"),
      (13L, "solo unique document nothing like it"))
    def write(name: String, rows: Seq[(Long, String)], mtime: Long): Unit = {
      val staging = tmp + "/stage_" + name
      rows.map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dest = java.nio.file.Paths.get(tmp, name + ".parquet")
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    write("b1", b1, 1000000L)
    write("b2", b2, 2000000L)
    val docs = spark.readStream.schema(DocsStream.schema)
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "b*.parquet")
      .parquet(tmp)
    // outputs live OUTSIDE the streamed directory: the file source scans
    // tmp, and partition-style output dirs (batch=N) under it would trip
    // partition discovery into CONFLICTING_DIRECTORY_STRUCTURES
    val out = java.nio.file.Files.createTempDirectory("docsnear_out").toString
    val q = DocsStream.nearDedupStream(docs,
      out + "/index", out + "/kept", out + "/ckpt",
      shingleN = 3, perms = 64, bands = 16, thresholdPpm = 500000L)
    q.processAllAvailable(); q.stop()
    val streamedKept = spark.read.parquet(out + "/kept")
      .select("doc_id").as[Long].collect().toSet
    // batch twin: incrementalDedup applied batch-by-batch from empty index
    val empty = Seq.empty[(Long, Seq[Long])].toDF("did", "sig")
    def docsDf(rows: Seq[(Long, String)]) =
      rows.map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val (k1, i1) = graft.pipeline.Dedup.incrementalDedup(
      docsDf(b1), "doc_id", col("text"), empty, 3, 64, 16, 500000L)
    val (k2, _) = graft.pipeline.Dedup.incrementalDedup(
      docsDf(b2), "doc_id", col("text"), i1, 3, 64, 16, 500000L)
    val batchKept = (k1.select("doc_id").as[Long].collect() ++
      k2.select("doc_id").as[Long].collect()).toSet
    assert(streamedKept === batchKept)
    assert(streamedKept === Set(1L, 2L, 11L, 13L))
    // the persisted index (resolved via the CURRENT pointer) holds
    // exactly the kept docs' signatures, and stale versions are swept
    val indexed = DocsStream.currentIndex(spark, out + "/index").get
      .select("did").as[Long].collect().toSet
    assert(indexed === batchKept)
    val versions = new java.io.File(out + "/index").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(versions === Set("v1"), s"stale versions not swept: $versions")
  }

  test("streaming IVF assignment equals batch ivfAssign; deltas compact " +
    "behind the CURRENT pointer") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ivfstream").toString
    def vec(i: Long): Seq[Float] =
      Seq.tabulate(8)(j => ((i * 31 + j * 7) % 13).toFloat / 13f)
    def write(name: String, ids: Seq[Long], mtime: Long): Unit = {
      val staging = tmp + "/stage_" + name
      ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")
        .coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      val dest = java.nio.file.Paths.get(tmp, name + ".parquet")
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    // 4 files → 4 microbatches; compactEvery=2 → compactions at b1, b3
    val tranches = (0 until 4).map(b =>
      (b.toLong * 25 until (b + 1).toLong * 25).toSeq)
    tranches.zipWithIndex.foreach { case (ids, b) =>
      write(s"e$b", ids, 1000000L * (b + 1))
    }
    val full = tranches.flatten.map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val cents = graft.pipeline.Similarity.centroids(full, 4)
    val emb = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
      .option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "e*.parquet")
      .parquet(tmp)
    val out = java.nio.file.Files.createTempDirectory("ivfstream_out").toString
    val q = DocsStream.ivfAssignStream(emb, cents,
      out + "/index", out + "/ckpt", compactEvery = 2)
    q.processAllAvailable(); q.stop()
    val streamed = DocsStream.currentIvfIndex(spark, out + "/index").get
      .select("cell", "vec_id").as[(Long, Long)].collect().toSet
    val batch = graft.pipeline.Similarity.ivfAssign(full, cents)
      .select(col("cell"), col("nid")).as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size === 100)
    // compacted: one base version named by the pointer, no live deltas
    val names = new java.io.File(out + "/index").listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("delta_b")),
      s"deltas not swept: ${names.toSeq}")
    val v = DocsStream.readPointer(spark, out + "/index").get
    assert(names.contains(v))
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

  test("streaming filter audit: per-batch observed metrics sum to the batch census") {
    import graft.pipeline.Observability
    val stages = Observability.standardStages()
    val audited = Observability.filterAuditedStream(
      DocsStream.readDocs(spark, dir), stages, metricName = "doc_audit")
    val q = audited.writeStream
      .outputMode("append").format("memory").queryName("docs_audited")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // accumulate the observed counters across every micro-batch
    val totals = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("doc_audit"))).foreach { row =>
      row.schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
        totals(f) += row.getLong(i)
      }
    }
    // streaming counters ≡ the one-pass batch census, stage by stage
    val batch = Observability.auditCensus(
      spark, graft.core.Tables.documents(spark, dir), stages)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    stages.foreach { case (name, _) =>
      assert(totals(s"dropped_$name") === batch(name), s"stage $name")
    }
    assert(totals("kept") === batch("kept"))
    assert(spark.table("docs_audited").count() === batch("kept"))
  }
}
