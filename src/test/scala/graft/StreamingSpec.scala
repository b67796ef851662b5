package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("streamed windowed counts equal the batch equivalent") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.windowedCounts(EventsStream.readStream(spark, dir)),
      "win_counts", org.apache.spark.sql.streaming.OutputMode.Append)
    // append mode only emits windows below the watermark; compare those
    val batch = graft.core.Tables.events(spark, dir)
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val streamedMap = streamed.select("window.start", "event_type", "n")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val batchMap = batch.select("window.start", "event_type", "n")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(streamedMap.nonEmpty)
    streamedMap.foreach { case (k, v) => assert(batchMap(k) === v, s"window $k") }
  }

  test("streaming key-skew monitor: heavy keys surface per window, " +
      "streamed sketch ≡ batch sketch") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.keySkewMonitor(EventsStream.readStream(spark, dir), k = 8),
      "skew_mon", org.apache.spark.sql.streaming.OutputMode.Append)
    val batch = graft.core.Tables.events(spark, dir)
      .withColumn("event_time",
        timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.MisraGries.misra_gries(
          col("user_id").cast("string"), 8).as("heavy_keys"))
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window.start").cast("long").as("w"), col("n_events"),
        col("heavy_keys"))
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(1),
          r.getSeq[org.apache.spark.sql.Row](2)
            .map(s => s.getString(0) -> s.getLong(1)).toMap)
      }.toMap
    val got = asMap(streamed)
    assert(got.nonEmpty)
    val want = asMap(batch)
    got.foreach { case (w, (n, heavy)) =>
      val (bn, bheavy) = want(w)
      assert(n === bn, s"window $w count")
      // the MG guarantee is deterministic given one merge tree; with the
      // single-file source both plans aggregate identically
      assert(heavy === bheavy, s"window $w sketch")
      // certification bound: any surfaced counter undercounts by at
      // most n/(k+1), so cnt*(k+1) > n proves a true heavy hitter —
      // and every true-majority key must be present
      heavy.foreach { case (_, c) => assert(c > 0L && c <= n) }
    }
  }

  test("streaming drift monitor: streamed TVD ≡ batch twin; a " +
      "hand-built window hits the exact hand-computed TVD") {
    // reference: the corpus-wide mix rounded to ppm (clicks slightly
    // overstated so every live window shows SOME drift)
    val ref = Map("click" -> 300000L, "error" -> 200000L,
      "purchase" -> 200000L, "signup" -> 200000L) // view → `other` 100000
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.driftMonitor(
        EventsStream.readStream(spark, dir), "event_type", ref),
      "drift_mon", org.apache.spark.sql.streaming.OutputMode.Append)
    val batchEvents = graft.core.Tables.events(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val batch = EventsStream.driftMonitor(batchEvents, "event_type", ref)
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window.start").cast("long").as("w"), col("n_events"),
        col("tvd_ppm"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = asMap(streamed)
    assert(got.nonEmpty)
    val want = asMap(batch)
    got.foreach { case (w, v) => assert(want(w) === v, s"window $w") }
    got.values.foreach { case (_, tvd) => assert(tvd >= 0L && tvd <= 1000000L) }
    // exact case: 10 events in one window — 5 click / 3 error / 1 view /
    // 1 unseen type. shares: click 500000 (|Δ|=200000), error 300000
    // (100000), purchase 0 (200000), signup 0 (200000), other 200000
    // (100000) → TVD = 800000/2 = 400000
    val rows = (Seq.fill(5)("click") ++ Seq.fill(3)("error") ++
      Seq("view", "search")).zipWithIndex
    val one = spark.createDataFrame(rows).toDF("event_type", "i")
      .withColumn("event_time", timestamp_micros(lit(1000000L) + col("i")))
    val r = EventsStream.driftMonitor(one, "event_type", ref)
      .select("n_events", "tvd_ppm").head()
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 400000L)
  }

  test("streaming quantile monitor: streamed windows ≡ batch twin; " +
      "window digests re-merge into the serving census") {
    import graft.operators.QuantileCensus
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.quantileMonitor(EventsStream.readStream(spark, dir)),
      "quant_mon", org.apache.spark.sql.streaming.OutputMode.Append)
    val batchEvents = graft.core.Tables.events(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val batch = EventsStream.quantileMonitor(batchEvents)
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window.start").cast("long").as("w"), col("n_events"),
        col("p50"), col("p99"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val got = asMap(streamed)
    assert(got.nonEmpty)
    val want = asMap(batch)
    // counts are exact and must match; quantile values may sit anywhere
    // inside the ε-rank band (merge trees differ between the streaming
    // and batch runs), so pin them against exact ranks instead
    got.foreach { case (w, (n, _, _)) => assert(want(w)._1 === n) }
    val allVals = batchEvents.where(col("value").isNotNull)
      .select("value").collect().map(_.getDouble(0)).toSeq
    got.values.foreach { case (_, p50, p99) =>
      // every window's p50/p99 is a real observed value
      assert(allVals.contains(p50) && allVals.contains(p99))
    }
    // the emitted window digests ARE census segments: re-merging them
    // answers p50 over the emitted horizon within the rank bound. The
    // FINAL window is legitimately absent (append mode emits a window
    // only once the watermark passes it; the stream ends first), so the
    // census target is the events inside emitted windows, not all rows.
    val emittedStarts = got.keySet
    val emittedVals = batchEvents
      .withColumn("w", window(col("event_time"), "1 hour"))
      .where(col("w.start").cast("long").isInCollection(emittedStarts))
      .select("value").collect().map(_.getDouble(0)).toSeq
    val n = emittedVals.size
    assert(n === got.values.map(_._1).sum)
    assert(n < allVals.size, "the open final window should be unemitted")
    val windowDigests = spark.table("quant_mon").select("digest")
    val merged = QuantileCensus.quantiles(windowDigests, Nil, Seq(0.5))
      .collect().head
    assert(merged.getLong(0) === n.toLong)
    val p50 = merged.getDouble(1)
    val le = emittedVals.count(_ <= p50)
    val lt = emittedVals.count(_ < p50)
    assert(le >= (0.5 - 0.002) * n - 1 && lt <= (0.5 + 0.002) * n + 1,
      s"re-merged p50=$p50 outside the rank band")
    // keyed form: one digest per (window, type); counts exact per cell
    val keyed = EventsStream
      .quantileMonitor(batchEvents, keys = Seq("event_type"))
      .select(col("window.start").cast("long"), col("event_type"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val wantKeyed = batchEvents
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .count()
      .select(col("window.start").cast("long"), col("event_type"),
        col("count"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(keyed === wantKeyed && keyed.nonEmpty)
  }

  test("streaming IVF maintenance: per-batch index adds land on the " +
      "full-rebuild search, batch by batch") {
    import graft.pipeline.Similarity
    val emb = graft.core.Tables.embeddings(spark, dir)
    val base = emb.where(col("vec_id") % 5 =!= 4).localCheckpoint(true)
    val cents = Similarity.centroids(base, 16)
    val queries = emb.where(col("vec_id") < 5).localCheckpoint(true)
    @volatile var index = Similarity.ivfAssign(base, cents)
      .localCheckpoint(true)
    @volatile var seen = base.count()
    val inDir = java.nio.file.Files.createTempDirectory("ivfstream").toString
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the O(delta) add: assign against the FROZEN quantizer, append,
        // re-checkpoint so index lineage stays one hop deep
        index = Similarity.ivfAddToIndex(index, batch, cents)
          .localCheckpoint(true)
        seen += batch.count()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    try {
      def searchRows() = Similarity
        .ivfTopKIndexed(queries, index, cents, 5, nprobe = 4)
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
      def rebuildRows(corpus: org.apache.spark.sql.DataFrame) = Similarity
        .ivfTopKIndexed(corpus.where(col("vec_id") < 5),
          Similarity.ivfAssign(corpus, cents), cents, 5, nprobe = 4)
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
      // the file source lists the stream ROOT — land each batch's
      // part-file there directly, not in a write-subdirectory
      def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("ivfb")
          .toString + "/out"
        df.coalesce(1).write.parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(inDir, s"$name.parquet"))
        ()
      }
      // batch 1: half the held-out vectors arrive
      val d1 = emb.where(col("vec_id") % 10 === 4)
      drop(d1, "b1")
      q.processAllAvailable()
      assert(seen === base.count() + d1.count())
      assert(searchRows() === rebuildRows(base.unionByName(d1)))
      // batch 2: the rest — the grown index ≡ a full-corpus rebuild
      drop(emb.where(col("vec_id") % 10 === 9), "b2")
      q.processAllAvailable()
      assert(seen === emb.count())
      assert(searchRows() === rebuildRows(emb))
    } finally q.stop()
  }

  test("streaming sketch census: per-batch appends serve exact " +
      "distincts, and a REPLAYED batch changes no estimate") {
    import graft.operators.HllCensus
    val ev = graft.core.Tables.events(spark, dir)
      .select("event_id", "ts", "event_type", "user_id")
      .localCheckpoint(true)
    val inDir = java.nio.file.Files.createTempDirectory("hllin").toString
    val tableDir = java.nio.file.Files
      .createTempDirectory("hlltab").toString + "/sketches"
    val ckDir = java.nio.file.Files.createTempDirectory("hllck").toString
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("hllb")
        .toString + "/out"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, s"$name.parquet"))
      ()
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = EventsStream.sketchMaintain(stream, tableDir, ckDir)
    try {
      val b1 = ev.where(col("event_id") % 2 === 0)
      val b2 = ev.where(col("event_id") % 2 === 1)
      def served() = HllCensus.estimate(
        spark.read.parquet(tableDir), Seq(col("event_type")), "n")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      drop(b1, "b1"); q.processAllAvailable()
      val exact1 = b1.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(served() === exact1)
      drop(b2, "b2"); q.processAllAvailable()
      val exactAll = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(served() === exactAll)
      // replay batch 1 wholesale (at-least-once delivery): more sketch
      // rows land, every estimate is unchanged — union idempotence, no
      // exactly-once sink machinery needed for distinct correctness
      val rowsBefore = spark.read.parquet(tableDir).count()
      drop(b1, "b1_replay"); q.processAllAvailable()
      assert(spark.read.parquet(tableDir).count() > rowsBefore)
      assert(served() === exactAll)
      // and compaction folds the append-run without moving any answer
      val compacted = HllCensus.compact(spark.read.parquet(tableDir),
        Seq(col("day"), col("event_type")))
      assert(HllCensus.estimate(compacted, Seq(col("event_type")), "n")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap === exactAll)
    } finally q.stop()
  }

  test("inode refresh: latest-wins merge with tombstones") {
    import org.apache.spark.sql.functions._
    val ino = graft.inodes.InodeView.inodes(spark, dir).limit(10)
    val first = ino.orderBy("id").limit(1)
    val muts = first.withColumn("user", lit("changed"))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
      .unionByName(
        ino.orderBy(col("id").desc).limit(1)
          .withColumn("op", lit("delete")).withColumn("seq", lit(2L)))
    val merged = graft.streaming.InodeRefresh.applyBatch(ino, muts)
    assert(merged.count() === 9) // one tombstoned
    val changedId = first.head().getAs[Long]("id")
    assert(merged.where(col("id") === changedId).head()
      .getAs[String]("user") === "changed")
  }

  test("inode refresh: streamed mutations republish the snapshot") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("muts").toString
    val ino = graft.inodes.InodeView.inodes(spark, dir).limit(20)
      .localCheckpoint(true)
    // write one mutation batch: delete the 5 largest ids
    ino.orderBy(col("id").desc).limit(5)
      .withColumn("op", lit("delete")).withColumn("seq", lit(1L))
      .write.parquet(tmp + "/batch1")
    var published: Option[Long] = None
    val q = graft.streaming.InodeRefresh.stream(spark, ino, tmp + "/batch1",
      snap => published = Some(snap.count()))
    q.awaitTermination()
    assert(published.contains(15L))
  }

  test("sessionization splits on idle gaps") {
    val events = EventsStream.readStream(spark, dir)
    val sessions = EventsStream.runToMemory(spark,
      EventsStream.sessionize(spark, events), "sessions")
    // closed sessions only (open ones stay in state); sanity: all positive
    // lengths, end >= start, per-user ordered
    val rows = sessions.collect()
    assert(rows.forall(r => r.getAs[Long]("end") >= r.getAs[Long]("start")))
    assert(rows.forall(r => r.getAs[Long]("n") >= 1))
  }

  test("batch sessionization: known gaps; agrees with the streaming path") {
    import spark.implicits._
    val m = 60L * 1000 * 1000000 // one minute in ns
    // user 1: events at 0,10,50min -> gaps 10,40 -> 2 sessions (2 evs, 1 ev)
    // user 2: one event -> 1 session
    val ev = Seq(
      (1L, 0L * m, 100L), (1L, 10L * m, 101L), (1L, 50L * m, 102L),
      (2L, 5L * m, 200L)
    ).toDF("user_id", "ts", "event_id")
    val got = EventsStream.sessionizeBatch(ev, gapNs = 30L * m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === (2L, 2L))
    assert(got(2L) === (1L, 1L))
    // vs streaming on the fixture: every user's LAST session stays open in
    // state, so batch counts exactly one more session per user with events
    val streamed = spark.table("sessions") // from the previous test's run
      .groupBy("userId").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("closed"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = EventsStream.sessionizeBatch(
        graft.core.Tables.events(spark, dir), 30L * m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch.nonEmpty)
    batch.foreach { case (uid, n) =>
      assert(n === streamed.getOrElse(uid, 0L) + 1,
        s"user $uid: batch $n vs closed ${streamed.getOrElse(uid, 0L)}")
    }
  }

  test("native session_window: adjacent spans merge, strict > gap splits") {
    import spark.implicits._
    val m = 60L * 1000 * 1000000 // one minute in ns
    val us = 1000L               // one µs in ns
    // user 1: 0,10,40min — the 10→40 gap is EXACTLY the 30min gap:
    // session_window merges ADJACENT spans, so this stays ONE session
    // (matching sessionizeBatch's strict >). user 2: gap of 30min + 1µs
    // -> splits on both paths. user 3: single event.
    val ev = Seq((1L, 0L * m, 1L), (1L, 10L * m, 2L), (1L, 40L * m, 3L),
                 (2L, 0L * m, 4L), (2L, 30L * m + us, 5L),
                 (3L, 0L * m, 6L)).toDF("user_id", "ts", "event_id")
    val native = EventsStream.sessionizeNative(ev, "30 minutes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native(1L) === (1L, 3L)) // exact-boundary event merged
    assert(native(2L) === (2L, 1L)) // 1µs past the gap splits
    assert(native(3L) === (1L, 1L))
    val lag = EventsStream.sessionizeBatch(ev, 30L * m).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(lag === native) // identical semantics at µs-exact inputs
    // and on the real fixture the two paths agree wholesale
    val nat = EventsStream.sessionizeNative(
        graft.core.Tables.events(spark, dir), "30 minutes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lagFx = EventsStream.sessionizeBatch(
        graft.core.Tables.events(spark, dir), 30L * m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nat === lagFx)
  }

  test("streaming session_window sessions match the batch native sessions") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.sessionizeNative(EventsStream.readStream(spark, dir),
        "30 minutes", watermark = Some("0 seconds")),
      "native_sessions", org.apache.spark.sql.streaming.OutputMode.Append)
    val batch = graft.core.Tables.events(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("user_id"), session_window(col("event_time"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("session_window.start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.get(1).toString) -> r.getLong(2)).toMap
    val sm = toMap(streamed)
    val bm = toMap(batch)
    // append mode emits only sessions closed below the final watermark —
    // every emitted session must match its batch twin exactly
    assert(sm.nonEmpty)
    sm.foreach { case (k, v) => assert(bm(k) === v, s"session $k") }
  }

  test("runToFinal: one-shot update-mode run serves EVERY window " +
      "including the final open one — full equality with the batch twin") {
    val batchEvents = graft.core.Tables.events(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    // windowed counts: bidirectional equality (append mode provably
    // withholds the final window on this input — pinned above — so
    // equality here IS the flush)
    val gotCounts = EventsStream.runToFinal(spark,
      EventsStream.windowedCounts(EventsStream.readStream(spark, dir)),
      Seq("window", "event_type"))
      .select(col("window.start").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val wantCounts = batchEvents
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(gotCounts.nonEmpty && gotCounts === wantCounts)
    // drift monitor: every window's TVD served, final included
    val ref = Map("click" -> 300000L, "error" -> 200000L,
      "purchase" -> 200000L, "signup" -> 200000L)
    val gotDrift = EventsStream.runToFinal(spark,
      EventsStream.driftMonitor(
        EventsStream.readStream(spark, dir), "event_type", ref),
      Seq("window"))
      .select(col("window.start").cast("long"), col("n_events"),
        col("tvd_ppm"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wantDrift = EventsStream.driftMonitor(batchEvents, "event_type", ref)
      .select(col("window.start").cast("long"), col("n_events"),
        col("tvd_ppm"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotDrift === wantDrift)
    // quantile monitor: exact per-window counts with nothing withheld
    val gotQ = EventsStream.runToFinal(spark,
      EventsStream.quantileMonitor(EventsStream.readStream(spark, dir)),
      Seq("window"))
      .select(col("window.start").cast("long"), col("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantQ = EventsStream.quantileMonitor(batchEvents)
      .select(col("window.start").cast("long"), col("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotQ === wantQ)
    // key-skew monitor: the Misra–Gries sketch column (array of structs)
    // survives the parquet spool; final window's sketch included
    val gotS = EventsStream.runToFinal(spark,
      EventsStream.keySkewMonitor(EventsStream.readStream(spark, dir), k = 8),
      Seq("window"))
      .select(col("window.start").cast("long"), col("n_events"),
        col("heavy_keys"))
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(1),
          r.getSeq[org.apache.spark.sql.Row](2)
            .map(s => s.getString(0) -> s.getLong(1)).toMap)
      }.toMap
    val wantS = EventsStream.keySkewMonitor(batchEvents, k = 8)
      .select(col("window.start").cast("long"), col("n_events"),
        col("heavy_keys"))
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(1),
          r.getSeq[org.apache.spark.sql.Row](2)
            .map(s => s.getString(0) -> s.getLong(1)).toMap)
      }.toMap
    assert(gotS.keySet === wantS.keySet)
    gotS.foreach { case (w, (n, _)) => assert(wantS(w)._1 === n) }
  }

  test("runToFinal leaves no temp-dir residue: a periodically-invoked " +
      "monitor accumulates zero on-disk state across runs") {
    def residue: Int = new java.io.File(
      System.getProperty("java.io.tmpdir")).listFiles()
      .count(_.getName.startsWith("graft-run-to-final"))
    val before = residue
    val got = EventsStream.runToFinal(spark,
      EventsStream.windowedCounts(EventsStream.readStream(spark, dir)),
      Seq("window", "event_type"))
    // the served result must not depend on the deleted spool
    assert(got.count() > 0)
    assert(residue === before,
      "runToFinal left its spool/checkpoint temp directory behind")
  }

  test("runToFinal latest-wins across micro-batches: a window updated " +
      "in two batches serves its final state, not its first emission") {
    import spark.implicits._
    val H = 3600L * 1000000000L
    val root = java.nio.file.Files.createTempDirectory("r2f").toString
    val in = new java.io.File(root, "in"); in.mkdirs()
    def writeBatch(idx: Int, rows: Seq[(Long, Long)]): Unit = {
      val stage = s"$root/stage$idx"
      rows.toDF("event_id", "ts")
        .select(col("event_id"), col("ts"), lit(7L).as("user_id"),
          lit("view").as("event_type"), lit(1.0).as("value"))
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(in, f"b$idx%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + idx * 60000L)
    }
    // batch 1: [10,11) gets one event; 12.5 h sets the watermark to 10.5 h
    writeBatch(1, Seq((1L, 10L * H + H / 2), (2L, 12L * H + H / 2)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val raw = spark.readStream.schema(schema).parquet(in.toString)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val spool = s"$root/spool"
    val q = EventsStream.windowedCounts(raw).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.withColumn("__batch", lit(id)).write.mode("append").parquet(spool)
        ()
      }.start()
    q.processAllAvailable()
    // batch 2: a LATE-but-inside-horizon event re-opens [10,11) → n=2
    writeBatch(2, Seq((3L, 10L * H + 7 * H / 10)))
    q.processAllAvailable()
    q.stop()
    val all = spark.read.parquet(spool)
    // [10,11) really was emitted twice (once per batch)...
    assert(all.where(col("window.start").cast("long") === 10L * 3600)
      .count() === 2L)
    // ...and latestPerKey serves the SECOND emission
    val fin = EventsStream.latestPerKey(all, Seq("window", "event_type"))
      .select(col("window.start").cast("long"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin === Map(10L * 3600 -> 2L, 12L * 3600 -> 1L))
  }

  test("watermark drops beyond-horizon late data across micro-batches") {
    import spark.implicits._
    val H = 3600L * 1000000000L // one hour in ns
    val root = java.nio.file.Files.createTempDirectory("late").toString
    val in = new java.io.File(root, "in"); in.mkdirs()
    // one parquet file per micro-batch, mtime-ordered for FileStreamSource
    def writeBatch(idx: Int, rows: Seq[(Long, Long)]): Unit = {
      val stage = s"$root/stage$idx"
      rows.toDF("event_id", "ts")
        .select(col("event_id"), col("ts"), lit(7L).as("user_id"),
          lit("view").as("event_type"), lit(1.0).as("value"))
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(in, f"b$idx%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + idx * 60000L)
    }
    // batch 1: 10.5 h and 12.5 h -> watermark after commit = 10.5 h
    writeBatch(1, Seq((1L, 10L * H + H / 2), (2L, 12L * H + H / 2)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val raw = spark.readStream.schema(schema).parquet(in.toString)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    // drive micro-batch boundaries EXPLICITLY (processAllAvailable
    // between file drops) — watermark semantics only bite across batches
    val q = EventsStream.windowedCounts(raw).writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("late_counts").start()
    q.processAllAvailable()
    // batch 2 (runs under watermark 10.5 h):
    //   8.2 h  -> BEYOND the horizon, must be dropped
    //   10.7 h -> late but inside, must count into [10,11)
    //   14.5 h -> advances the post-commit watermark to 12.5 h
    writeBatch(2, Seq((3L, 8L * H + H / 5), (4L, 10L * H + 7 * H / 10),
      (5L, 14L * H + H / 2)))
    q.processAllAvailable()
    // batch 3 (runs under watermark 12.5 h): flushes [10,11)
    writeBatch(3, Seq((6L, 15L * H)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_counts")
      .select(col("window.start").cast("long"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // [10,11) flushed with BOTH its events (the inside-horizon late row
    // counted); the beyond-horizon 8.2 h row left no [8,9) window
    assert(rows.get(10L * 3600).contains(2L),
      s"window [10,11) should hold 2 events, got $rows")
    assert(!rows.contains(8L * 3600),
      s"beyond-watermark late row must be dropped, got $rows")
  }

  test("stream-static join: events enriched with a static dimension") {
    // the enrichment pattern: a streaming fact joined to a STATIC
    // (broadcastable) dimension needs no watermark and no state — each
    // micro-batch joins the dim like a batch query
    val userDim = graft.core.Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(countDistinct(col("event_type")).as("n_types"))
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.readStream(spark, dir)
        .join(broadcast(userDim), "user_id")
        .groupBy(col("n_types"))
        .agg(count(lit(1)).as("n_events")),
      "enriched", org.apache.spark.sql.streaming.OutputMode.Complete)
    val got = streamed.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.core.Tables.events(spark, dir)
      .join(userDim, "user_id")
      .groupBy(col("n_types")).agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want && got.nonEmpty)
  }

  test("streaming funnel depth equals the batch funnel per user") {
    val steps = Seq("signup", "view", "click", "purchase")
    val winNs = 7L * 86400L * 1000000000L
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.funnelStream(spark,
        EventsStream.readStream(spark, dir), steps, winNs),
      "funnel_depths", org.apache.spark.sql.streaming.OutputMode.Update)
    val got = streamed.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // batch truth: user reached depth i iff present in funnelTimes level i
    val levels = graft.operators.WindowFunnel.funnelTimes(
      graft.core.Tables.events(spark, dir), steps, winNs)
    val want = scala.collection.mutable.Map[Long, Int]().withDefaultValue(0)
    levels.zipWithIndex.foreach { case (df, i) =>
      df.select("user_id").collect().foreach { r =>
        val u = r.getLong(0)
        want(u) = math.max(want(u), i + 1)
      }
    }
    assert(got.nonEmpty)
    // every user with funnel progress must match exactly; users with
    // depth 0 appear in `got` (they had events) but not in `want`
    got.foreach { case (u, d) =>
      assert(d === want(u), s"user $u: streamed depth $d vs batch ${want(u)}")
    }
    assert(want.forall { case (u, d) => got.get(u).contains(d) })
  }

  test("streaming funnel carries chain state across micro-batches") {
    import spark.implicits._
    val m = 60L * 1000 * 1000000 // one minute in ns
    val root = java.nio.file.Files.createTempDirectory("funnel2").toString
    val in = new java.io.File(root, "in"); in.mkdirs()
    def writeBatch(idx: Int, rows: Seq[(Long, String, Long)]): Unit = {
      val stage = s"$root/stage$idx"
      rows.map { case (u, t, ts) => (ts, ts, u, t, 0.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(in, f"b$idx%02d.parquet").toPath)
    }
    // batch 1: user 1 reaches view; user 2 signs up; user 3 only views
    writeBatch(1, Seq((1L, "signup", 1 * m), (1L, "view", 2 * m),
      (2L, "signup", 3 * m), (3L, "view", 1 * m)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    val q = EventsStream.funnelStream(spark,
        spark.readStream.schema(schema).parquet(in.toString),
        Seq("signup", "view", "click", "purchase"),
        7L * 86400L * 1000000000L)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .format("memory").queryName("funnel_batches").start()
    q.processAllAvailable()
    // batch 2 (later event times): user 1 clicks then purchases — the
    // chain must continue from batch-1 state (t1, t2 remembered); user 3
    // signs up AFTER its stray view — depth becomes 1, the old view must
    // NOT count as step 2 (it precedes t1)
    writeBatch(2, Seq((1L, "click", 10 * m), (1L, "purchase", 11 * m),
      (3L, "signup", 12 * m)))
    q.processAllAvailable()
    q.stop()
    // Update mode: take each user's LAST emitted depth
    val rows = spark.table("funnel_batches").collect()
    val last = rows.zipWithIndex
      .groupBy(_._1.getLong(0))
      .map { case (u, rs) => u -> rs.maxBy(_._2)._1.getInt(1) }
    assert(last(1L) === 4, s"user 1 should complete the funnel: $last")
    assert(last(2L) === 1)
    assert(last(3L) === 1, "pre-signup view must not count as a step")
  }

  test("streaming as-of matches the batch as-of; state carries refs across batches") {
    import spark.implicits._
    val m = 60L * 1000 * 1000000 // one minute in ns
    val root = java.nio.file.Files.createTempDirectory("asofstream").toString
    val in = new java.io.File(root, "in"); in.mkdirs()
    def writeBatch(idx: Int, rows: Seq[(Long, Long, Boolean, Long)]): Unit = {
      val stage = s"$root/stage$idx"
      rows.toDF("user_id", "ts", "isPoint", "event_id")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(in, f"b$idx%02d.parquet").toPath)
    }
    // batch 1: refs at 1m/5m (u1), 2m (u2); points at 3m (u1: matches
    // 1m... no — latest ≤ 3m is 1m? refs 1m and 5m: 1m), 2m (u2: equal
    // ts is INCLUSIVE → 2m), 1m (u3: no refs → -1)
    writeBatch(1, Seq(
      (1L, 1 * m, false, -1L), (1L, 5 * m, false, -1L), (2L, 2 * m, false, -1L),
      (1L, 3 * m, true, 10L), (2L, 2 * m, true, 20L), (3L, 1 * m, true, 30L)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("isPoint",
        org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema).parquet(in.toString)
    val q = EventsStream.asofStream(spark,
        stream.where(col("isPoint")),
        stream.where(!col("isPoint")).drop("event_id"))
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("asof_stream").start()
    q.processAllAvailable()
    // batch 2: points ONLY — every match must come from batch-1 state
    // (u1's latest ref was 5m; u2's 2m; u3 still none)
    writeBatch(2, Seq(
      (1L, 9 * m, true, 11L), (2L, 9 * m, true, 21L), (3L, 9 * m, true, 31L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_stream").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(10L -> 1 * m, 20L -> 2 * m, 30L -> -1L,
      11L -> 5 * m, 21L -> 2 * m, 31L -> -1L), got.toString)

    // randomized single-batch equivalence vs the batch operator
    val rnd = new scala.util.Random(33)
    val pts = (0 until 2000).map(i =>
      (rnd.between(0L, 50L), rnd.between(0L, 500000L), i.toLong))
      .toDF("user_id", "ts", "event_id")
    val refs = (0 until 600).map(_ =>
      (rnd.between(0L, 50L), rnd.between(0L, 500000L)))
      .toDF("user_id", "ts")
    val tmp2 = s"$root/rand"
    pts.select(col("user_id"), col("ts"), lit(true).as("isPoint"),
        col("event_id"))
      .unionByName(refs.select(col("user_id"), col("ts"),
        lit(false).as("isPoint"), lit(-1L).as("event_id")))
      .coalesce(1).write.parquet(tmp2)
    val s2 = spark.readStream.schema(schema).parquet(tmp2)
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.asofStream(spark, s2.where(col("isPoint")),
        s2.where(!col("isPoint")).drop("event_id")), "asof_rand")
    val gotR = streamed.collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val wantR = graft.operators.AsOfJoin
      .asofJoin(pts, refs.withColumnRenamed("ts", "rts")
        .withColumn("ts", col("rts")), "user_id", "ts", Seq("rts"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("asof_rts")).map(_.asInstanceOf[Long])
          .getOrElse(-1L)).toMap
    assert(gotR === wantR, "streaming as-of diverged from the batch join")
  }

  test("streaming as-of late-ref contract: an already-emitted point is " +
      "not retro-corrected; the next point picks the late ref up") {
    // pins the documented contract at EventsStream.asofStream ("a ref
    // arriving after a later-ts point was already emitted does not
    // retro-correct it"): batch 2 delivers refs with ts OLDER than
    // points batch 1 already emitted.
    import spark.implicits._
    val m = 60L * 1000 * 1000000
    val root = java.nio.file.Files.createTempDirectory("asoflate").toString
    val in = new java.io.File(root, "in"); in.mkdirs()
    def writeBatch(idx: Int, rows: Seq[(Long, Long, Boolean, Long)]): Unit = {
      val stage = s"$root/stage$idx"
      rows.toDF("user_id", "ts", "isPoint", "event_id")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(in, f"b$idx%02d.parquet").toPath)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("isPoint",
        org.apache.spark.sql.types.BooleanType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType)))
    // batch 1: u1 has a ref at 5m and a point at 6m (emitted with 5m);
    // u3 has a point at 4m with no ref (emitted with -1)
    writeBatch(1, Seq((1L, 5 * m, false, -1L), (1L, 6 * m, true, 10L),
      (3L, 4 * m, true, 30L)))
    val stream = spark.readStream.schema(schema).parquet(in.toString)
    val q = EventsStream.asofStream(spark,
        stream.where(col("isPoint")),
        stream.where(!col("isPoint")).drop("event_id"))
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("asof_late").start()
    q.processAllAvailable()
    val afterB1 = spark.table("asof_late").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(afterB1.toSet === Set((10L, 6 * m, 5 * m), (30L, 4 * m, -1L)))
    // batch 2: LATE refs only — u1's at 3m (older than the emitted 6m
    // point AND older than its current state 5m), u3's at 2m (older
    // than its emitted 4m point, but its first ref ever)
    writeBatch(2, Seq((1L, 3 * m, false, -1L), (3L, 2 * m, false, -1L)))
    q.processAllAvailable()
    // half 1 of the contract: nothing re-emitted, nothing rewritten —
    // the sink still holds exactly the two batch-1 rows, unchanged
    val afterB2 = spark.table("asof_late").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(afterB2.toSet === Set((10L, 6 * m, 5 * m), (30L, 4 * m, -1L)),
      s"late refs must not retro-correct emitted points: ${afterB2.toSeq}")
    // batch 3: new points — u1's must still see 5m (the late 3m ref
    // never regresses the running max), u3's picks up the late 2m ref
    writeBatch(3, Seq((1L, 9 * m, true, 11L), (3L, 9 * m, true, 31L)))
    q.processAllAvailable()
    q.stop()
    val byId = spark.table("asof_late").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId(11L) === 5 * m,
      "a late ref older than the state's latest must not regress it")
    assert(byId(31L) === 2 * m,
      "a key with no newer ref must pick the late ref up")
    assert(byId.size === 4, s"exactly one row per point: $byId")
  }

  test("stream-stream interval join equals the batch join pair-for-pair") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.purchaseErrorJoin(EventsStream.readStream(spark, dir)),
      "ss_join", org.apache.spark.sql.streaming.OutputMode.Append)
    val batch = EventsStream.purchaseErrorJoin(
      graft.core.Tables.events(spark, dir)
        .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long"))))
    def pairs(df: org.apache.spark.sql.DataFrame) = df.select("p_id", "e_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sp = pairs(streamed)
    val bp = pairs(batch)
    // single micro-batch: every pair is co-resident, so the inner
    // stream-stream join must emit exactly the batch join
    assert(sp.nonEmpty, "no purchase/error pairs in fixture")
    assert(sp === bp, s"streaming ${sp.size} vs batch ${bp.size} pairs")
  }

  test("approx_count_distinct tracks the exact vocabulary within 5%") {
    import org.apache.spark.sql.functions._
    val toks = graft.core.Tables.documents(spark, dir)
      .select(explode(graft.pipeline.TextAnalysis.tokens(col("text"))).as("tok"))
    val r = toks.agg(
      countDistinct(col("tok")).as("exact"),
      approx_count_distinct(col("tok")).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("100k-event randomized streaming/batch sessionization equivalence on RocksDB") {
    import spark.implicits._
    // seeded generator: ~500 users, ns timestamps over ~3 days, so gap
    // splits are frequent and per-user event counts are in the hundreds
    val rnd = new scala.util.Random(42)
    val threeDaysNs = 3L * 24 * 3600 * 1000 * 1000000L
    val rows = (0 until 100000).map { i =>
      (rnd.nextInt(500).toLong, (rnd.nextDouble() * threeDaysNs).toLong, i.toLong)
    }
    val tmp = java.nio.file.Files.createTempDirectory("sess100k").toString + "/ev"
    rows.toDF("user_id", "ts", "event_id")
      // ONE file -> one streaming micro-batch: cross-batch event-time
      // disorder is out of scope for the gap fold (files are unordered)
      .coalesce(1).write.parquet(tmp)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType)))
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    EventsStream.useRocksDbStateStore(spark)
    val gapMs = 10L * 60 * 1000
    try {
      val streamed = EventsStream.runToMemory(spark,
        EventsStream.sessionize(spark,
          spark.readStream.schema(schema).parquet(tmp), gapMs),
        "sessions_100k")
      assert(streamed.queryExecution.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
      val closedStreamed = streamed
        .select($"userId", $"start", $"end", $"n")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch twin: identical sessions minus each user's open last one
      val frames = EventsStream.sessionFramesBatch(
        spark.read.parquet(tmp), gapMs)
      val lastSess = frames.groupBy($"userId".as("u"))
        .agg(max($"sess").as("last"))
      val closedBatch = frames
        .join(lastSess, frames("userId") === $"u" && $"sess" === $"last",
          "left_anti")
        .select($"userId", $"start", $"end", $"n")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(closedStreamed.size > 10000, s"only ${closedStreamed.size} closed sessions")
      assert(closedStreamed === closedBatch,
        s"streaming/batch mismatch: ${closedStreamed.size} vs ${closedBatch.size}; " +
        s"sample diff ${(closedStreamed diff closedBatch).take(3)} / " +
        s"${(closedBatch diff closedStreamed).take(3)}")
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }
}
