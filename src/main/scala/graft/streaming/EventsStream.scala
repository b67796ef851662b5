package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no stream-processing semantics (its "streaming" is
  * HTTP response streaming — SURVEY §1.3), so this module is part of the
  * beyond-the-reference pipeline surface: watermarked windowed aggregation
  * and stateful sessionization, testable locally by pointing `readStream`
  * at the static parquet and draining with `processAllAvailable()`.
  */
object EventsStream {

  /** Streaming sources need an explicit schema, and the fixture's `ts`
    * encoding has drifted across vintages (TIMESTAMP(NANOS)-as-LONG vs
    * TIMESTAMP(MICROS)). Peek the actual parquet schema with a cheap batch
    * footer read, then normalize through the same
    * [[graft.core.Tables.normalizeTsNanos]] contract as the batch loader,
    * so downstream stateful operators always see epoch-nanos LongType. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema: StructType =
      spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(fileSchema)
      // FileStreamSource needs a directory; select the single table file
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.core.Tables.normalizeTsNanos(raw)
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
  }

  /** Tumbling-window count+sum per event type with a watermark. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Live key-skew monitor — the streaming twin of the
    * `profile_key_skew` pre-flight: per tumbling window, the
    * Misra–Gries heavy-key sketch over `user_id` plus the window's
    * event count, so an operator watches whale keys FORM instead of
    * discovering them post-mortem in a straggler task. State per
    * window is the k-counter sketch (k·(key, long) — bytes, not the
    * key distribution), merged partial-then-final like any aggregate,
    * bounded by the watermark horizon; any counter's undercount is
    * ≤ n_events/(k+1), so `cnt·(k+1) > n_events` certifies a true
    * heavy hitter. */
  def keySkewMonitor(events: DataFrame, k: Int = 8,
                     window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.MisraGries.misra_gries(
          col("user_id").cast("string"), k).as("heavy_keys"))

  /** Live distribution-drift monitor — the streaming twin of the
    * `profile_corpus_drift` pre-flight: per tumbling window, the
    * categorical share over `byCol` is compared against a REFERENCE
    * ppm distribution (yesterday's profile / the training corpus mix),
    * emitting total-variation distance in ppm — the pipeline watches
    * its input mix drift live instead of discovering it in the next
    * batch profile. The reference enumerates the expected categories,
    * so the window aggregates one conditional count per category plus
    * an `other` bucket in ONE windowed aggregation (chained streaming
    * aggregations are not expressible) — state per window is
    * |categories|+1 longs, watermark-bounded. Integer-exact end to
    * end for the same reason as the batch twin: a log-based metric's
    * last-ulp variance makes alert thresholds flap; TVD in ppm is
    * bit-stable across runs and engines. Works unchanged on a batch
    * frame (the spec's equivalence oracle). */
  def driftMonitor(events: DataFrame, byCol: String,
                   refPpm: Map[String, Long],
                   window_ : String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    require(refPpm.nonEmpty && refPpm.values.forall(_ >= 0L) &&
      refPpm.values.sum <= 1000000L, "reference shares must be ppm")
    val cats = refPpm.keys.toSeq.sorted
    val cnts = cats.zipWithIndex.map { case (c, i) =>
      sum(when(col(byCol) === c, 1L).otherwise(0L)).as(s"__n$i") }
    val agg = events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_))
      .agg(count(lit(1)).as("n_events"), cnts: _*)
    // decimal operands before the cross-multiply (a whale window's
    // count * 1e6 wraps a BIGINT) and integer `div`, not decimal `/`
    // (which rounds HALF_UP at the result scale — an off-by-one vs
    // floor when the quotient grazes an integer)
    def sharePpm(n: String) = expr(
      s"cast($n as decimal(38,0)) * 1000000 div n_events")
    val diffs = cats.zipWithIndex.map { case (c, i) =>
      abs(sharePpm(s"__n$i") - lit(refPpm(c))) }
    val otherObs = sharePpm(
      s"n_events - (${cats.indices.map(i => s"__n$i").mkString(" + ")})")
    val otherDiff = abs(otherObs - lit(1000000L - refPpm.values.sum))
    agg.select(col("window"), col("n_events"),
      shiftright((diffs :+ otherDiff).reduce(_ + _), 1).as("tvd_ppm"))
  }

  /** Live percentile monitor — the streaming twin of the quantile
    * census ([[graft.operators.QuantileCensus]]): per tumbling window,
    * a GK digest over `valueCol` plus the window's p50/p95/p99 and
    * exact count, so an operator watches a latency tail MOVE instead of
    * reading it off tomorrow's batch profile. State per window is ONE
    * digest (O(1/ε · log(εN)) samples — KBs, never the value
    * distribution), merged partial-then-final like any aggregate and
    * bounded by the watermark horizon. The emitted `digest` column is
    * the same portable image the batch census persists, so downstream
    * can re-merge windows into coarser serving segments
    * ([[graft.operators.QuantileCensus.compact]]) without touching raw
    * rows. Works unchanged on a batch frame (the spec's equivalence
    * oracle). `keys` adds grouping under the window — "p99 per
    * event_type per hour" — with state one digest per (window × key). */
  def quantileMonitor(events: DataFrame, valueCol: String = "value",
                      relativeError: Double = 0.001,
                      window_ : String = "1 hour",
                      watermark: String = "2 hours",
                      keys: Seq[String] = Nil): DataFrame = {
    import graft.functions.QuantileDigest._
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_) +: keys.map(col): _*)
      .agg(quantile_digest_agg(col(valueCol), relativeError).as("digest"))
      .select((col("window") +: keys.map(col)) ++ Seq(
        quantile_digest_count(col("digest")).as("n_events"),
        quantile_digest_query(col("digest"), 0.5).as("p50"),
        quantile_digest_query(col("digest"), 0.95).as("p95"),
        quantile_digest_query(col("digest"), 0.99).as("p99"),
        col("digest")): _*)
  }

  case class Sess(userId: Long, start: Long, end: Long, n: Long)
  case class Ev(user_id: Long, ts: Long)

  /** Gap-based sessionization with flatMapGroupsWithState: emits a session
    * row when a user is idle longer than `gapMs`. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), (col("ts") / 1000000L).cast("long").as("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Sess, Sess](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Sess]) =>
          // batch-drain variant: fold sorted events into gap-split sessions
          val sorted = evs.map(_.ts).toSeq.sorted
          val (closed, open) = sorted.foldLeft(
            (List.empty[Sess], state.getOption)) {
            case ((done, cur), t) => cur match {
              case Some(s) if t - s.end <= gapMs =>
                (done, Some(s.copy(end = t, n = s.n + 1)))
              case Some(s) => (s :: done, Some(Sess(uid, t, t, 1)))
              case None => (done, Some(Sess(uid, t, t, 1)))
            }
          }
          open.foreach(state.update)
          closed.reverseIterator
      }.toDF()
  }

  /** Batch (window-function) sessionization over the same gap semantics as
    * [[sessionize]]: a new session starts when the gap to the previous
    * event of the same user exceeds `gapNs`. One shuffle on user_id;
    * nanosecond-integer arithmetic end to end, so per-user session stats
    * are exactly reproducible in SQL — the oracle-checked twin of the
    * stateful streaming path. Output: (user_id, n_sessions,
    * max_session_events). */
  def sessionizeBatch(events: DataFrame, gapNs: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("new_sess",
        when(col("ts") - lag("ts", 1).over(w) > gapNs, 1L).otherwise(0L))
      .withColumn("sess", sum("new_sess").over(run))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg((max(col("sess")) + 1L).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
  }

  /** Native `session_window` sessionization — the scale path. Spark's
    * session-window aggregation (UpdatingSessions / MergingSessions
    * physical operators) is hash aggregation with per-key interval
    * merging: partial aggregation runs map-side, there is no per-user
    * sort-window over the whole corpus like [[sessionizeBatch]]'s lag
    * chain, and the SAME logical plan runs under Structured Streaming
    * where the state store evicts sessions as the watermark passes —
    * which is what makes this the 100 TB/continuous variant.
    *
    * Gap semantics match the lag twin: adjacent session spans merge
    * (an event landing EXACTLY `gap` after the previous one extends the
    * session — test-pinned), so a new session starts only on a strict
    * `> gap` silence. The one residual difference is resolution: merging
    * happens on µs `event_time` (ns truncated), so a gap inside 1 µs of
    * the boundary can round across it. Output shape matches
    * [[sessionizeBatch]]: (user_id, n_sessions, max_session_events). */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes",
                       watermark: Option[String] = None): DataFrame = {
    // integer ns→µs floor division: double division rounds-to-nearest and
    // can land 1 µs off at epoch-ns magnitudes (~1.7e18)
    val timed = events.withColumn(
      "event_time", timestamp_micros(expr("ts div 1000")))
    val maybeMarked = watermark.fold(timed)(timed.withWatermark("event_time", _))
    val perSession = maybeMarked
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"))
    if (maybeMarked.isStreaming) perSession // per-session rows for the sink
    else perSession
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
  }

  /** Per-session frame twin of [[sessionize]] in BATCH: one row per
    * session (userId, sess, start, end, n), ms-quantized exactly like the
    * streaming fold (ts ns → ms BEFORE the gap compare). Dropping each
    * user's last (still-open) session gives precisely the closed-session
    * frame the streaming path emits — the exact-equivalence anchor. */
  def sessionFramesBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val run = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .select(col("user_id"), (col("ts") / 1000000L).cast("long").as("ts_ms"),
        col("event_id"))
      .withColumn("new_sess",
        when(col("ts_ms") - lag("ts_ms", 1).over(w) > gapMs, 1L).otherwise(0L))
      .withColumn("sess", sum("new_sess").over(run))
      .groupBy(col("user_id").as("userId"), col("sess"))
      .agg(min("ts_ms").as("start"), max("ts_ms").as("end"),
        count(lit(1)).as("n"))
  }

  /** Stream-stream event-time interval join: each purchase joined to the
    * same user's error events in the PRECEDING hour. Works on a streaming
    * OR batch frame with an `event_time` column (the logical plan is
    * identical — under streaming both sides carry watermarks and the
    * range condition lets the state store evict rows older than the join
    * horizon, which is what bounds state on an unbounded stream: errors
    * need never be retained past watermark + 1 h). */
  def purchaseErrorJoin(events: DataFrame): DataFrame = {
    val streaming = events.isStreaming
    def marked(df: DataFrame, tsCol: String, horizon: String) =
      if (streaming) df.withWatermark(tsCol, horizon) else df
    val purchases = marked(
      events.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_time").as("p_time"),
          col("event_id").as("p_id")),
      "p_time", "1 hour")
    val errors = marked(
      events.where(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("event_time").as("e_time"),
          col("event_id").as("e_id")),
      "e_time", "2 hours")
    purchases.join(errors, expr(
      "user_id = e_user AND " +
      "e_time BETWEEN p_time - INTERVAL 1 HOUR AND p_time"))
      .select(col("user_id"), col("p_id"), col("e_id"))
  }

  case class FunnelState(times: Array[Long])

  /** Streaming window funnel: per-user greedy-earliest chain state
    * (t₁…t_k, -1 = unreached) maintained incrementally with
    * `flatMapGroupsWithState`, emitting the user's current depth each
    * batch (Update mode). For EVENT-TIME-ORDERED streams (per user —
    * the Kafka-partitioned-by-user case) the incremental greedy is
    * EXACT: each step records the first qualifying event, which is the
    * batch funnel's conditional min; within a batch the group iterator
    * is sorted by ts first. A late event carrying an earlier t₁ could
    * retroactively invalidate deeper steps — out-of-scope here, exactly
    * as for the reference funnel engines this mirrors; state is one
    * k-long array per user (RocksDB-spillable at 100 TB user counts). */
  def funnelStream(spark: SparkSession, events: DataFrame,
                   steps: Seq[String],
                   windowNs: Long): DataFrame = {
    import spark.implicits._
    val k = steps.length
    events.select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, (Long, Int)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[(Long, String, Long)],
         state: GroupState[FunnelState]) =>
          val t = state.getOption.map(_.times)
            .getOrElse(Array.fill(k)(-1L))
          evs.toSeq.sortBy(_._3).foreach { case (_, tpe, ts) =>
            val i = steps.indexOf(tpe)
            if (i == 0) { if (t(0) < 0) t(0) = ts }
            else if (i > 0 && t(i) < 0 && t(i - 1) >= 0 &&
              ts > t(i - 1) && ts < t(0) + windowNs) t(i) = ts
          }
          state.update(FunnelState(t))
          Iterator.single((uid, t.takeWhile(_ >= 0).length))
      }.toDF("user_id", "depth")
  }

  /** Streaming as-of enrichment: every point event is annotated with the
    * latest reference event of the same key at or before its ts —
    * `merge_asof(direction='backward')` as a LIVE operator. Points and
    * refs union into ONE keyed stream; per-key state is a single long
    * (the latest ref ts seen), so state size is O(keys) regardless of
    * history — RocksDB-spillable like the other keyed-state operators.
    *
    * Contract (same class as [[funnelStream]]): within a batch the group
    * iterator is sorted by (ts, ref-before-point) — inclusive at equal
    * ts, matching the batch operator — and across batches the state
    * carries the running latest ref. EXACT for per-key event-time-ordered
    * arrival (the Kafka-partitioned-by-key case); a ref arriving after a
    * later-ts point was already emitted does not retro-correct it — and
    * being a running MAX, a late ref older than the state's latest never
    * regresses it either; a key whose only ref is the late one picks it
    * up from the next point on. Both halves are spec-pinned
    * (`StreamingSpec`, "streaming as-of late-ref contract").
    * Output: (event_id, user_id, ts, asof_ref_ts) with −1 = no ref yet. */
  def asofStream(spark: SparkSession, points: DataFrame,
                 refs: DataFrame): DataFrame = {
    import spark.implicits._
    val tagged = points
      .select(col("user_id"), col("ts"), lit(true).as("isPoint"),
        col("event_id"))
      .unionByName(refs.select(col("user_id"), col("ts"),
        lit(false).as("isPoint"), lit(-1L).as("event_id")))
    tagged.as[(Long, Long, Boolean, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[(Long, Long, Boolean, Long)],
         state: GroupState[Long]) =>
          // Long.MinValue = no ref yet (a -1 sentinel would swallow
          // legitimately negative ref timestamps)
          var lastRef = state.getOption.getOrElse(Long.MinValue)
          val out = scala.collection.mutable.ListBuffer[(Long, Long, Long, Long)]()
          // ts asc; refs (false) before points (true) at equal ts
          evs.toSeq.sortBy(e => (e._2, e._3)).foreach {
            case (_, ts, isPoint, eid) =>
              if (!isPoint) lastRef = math.max(lastRef, ts)
              else out += ((eid, uid, ts,
                if (lastRef == Long.MinValue) -1L else lastRef))
          }
          state.update(lastRef)
          out.iterator
      }.toDF("event_id", "user_id", "ts", "asof_ref_ts")
  }

  /** RocksDB state store: the production config for stateful streaming.
    * The default (HDFSBackedStateStoreProvider) keeps every user's session
    * state as JVM heap objects per executor — at 100 TB-scale cardinality
    * (hundreds of millions of keys) that's an OOM; RocksDB spills state to
    * local disk with bounded heap, and ships in Spark core. */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def useRocksDbStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)

  /** Streaming maintenance of the [[graft.operators.HllCensus]] distinct
    * sketch table: each micro-batch is sketched per (day, event_type)
    * segment — O(batch) work, the same partial-aggregated pass as the
    * batch build — and APPENDED to the persisted table; serving merges
    * the append-run via `hll_union_agg` ([[graft.operators.HllCensus.estimate]]).
    *
    * The sink is append-only parquet with NO exactly-once coordination,
    * and that is deliberately sufficient: HLL union is idempotent per
    * item, so a replayed batch (at-least-once delivery, a foreachBatch
    * retry after a partial write) adds sketch rows that change NO
    * estimate — the spec pins a full replay leaving every count
    * unchanged. Distinct counting is the rare aggregate where the sketch
    * is structurally immune to double-delivery; the additive twins
    * (windowed counts) need the checkpoint/idempotent-sink contract
    * instead. Periodic [[graft.operators.HllCensus.compact]] bounds the
    * append-run length; estimates are invariant under it.
    */
  def sketchMaintain(events: DataFrame, tableDir: String,
                     checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.HllCensus.build(batch,
            Seq(expr("ts div 86400000000000").as("day"),
              col("event_type")),
            col("user_id"))
          .write.mode("append").parquet(tableDir)
        ()
      }
      .start()

  /** Run a streaming query to completion against the static fixture
    * (memory sink) and return the result table. */
  def runToMemory(spark: SparkSession, streamed: DataFrame,
                  name: String, mode: OutputMode = OutputMode.Append): DataFrame = {
    val q: StreamingQuery = streamed.writeStream
      .outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Latest-update-per-key selection over a spool of Update-mode batch
    * outputs tagged with a `__batch` column: for each key the row from
    * the highest batch wins (a window updated across several
    * micro-batches serves its final state). One shuffle of
    * result-table-sized rows (windows × keys), never raw events. */
  def latestPerKey(spool: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("__batch").desc)
    spool.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__batch", "__rn")
  }

  /** One-shot run of a windowed monitor that INCLUDES the final,
    * still-open window. Append mode emits a window only once the
    * watermark passes its end, so a bounded (AvailableNow) run withholds
    * the last open window(s) — correct for an unbounded stream,
    * data-losing for a one-shot backfill or a drained monitor. This
    * runner executes the SAME plan in Update mode, spools every
    * micro-batch's emitted updates to parquet tagged with the batch id,
    * and serves the latest update per key ([[latestPerKey]]) — which
    * once the bounded input is drained is exactly the batch answer,
    * final window included (spec-pinned against the batch twin).
    * Watermark state eviction still runs underneath exactly as in
    * append mode, and the spool holds emitted RESULT rows only, so
    * neither state nor spool is ever events-sized. `keyCols` are the
    * aggregation's grouping columns (e.g. `window` or
    * `window, event_type`).
    *
    * Work-dir lifecycle: by default each run spools to a fresh temp
    * directory, eagerly materializes the (result-table-sized) answer
    * off it, and deletes the directory before returning — a
    * periodically-invoked monitor accumulates NO on-disk state across
    * runs. Pass `workDir` to own the location instead (e.g. to keep
    * the streaming checkpoint for a resumable run); the caller then
    * owns its cleanup and the result stays a lazy view over the
    * spool.
    *
    * Durability caveat on the default path: the returned frame's rows
    * live in NON-replicated executor-local checkpoint blocks and its
    * lineage roots on the already-deleted spool, so losing an executor
    * after return makes the frame permanently unrecomputable — it
    * FAILS rather than recomputes. That is the right trade for a
    * single-JVM monitor consuming its answer promptly (the intended
    * use); a caller that must survive executor loss, or hold the
    * result long-term, should either collect the (result-table-sized)
    * rows to the driver immediately or pass `workDir` and keep the
    * spool alive as the recompute root. */
  def runToFinal(spark: SparkSession, streamed: DataFrame,
                 keyCols: Seq[String],
                 workDir: Option[String] = None): DataFrame = {
    val root = workDir.getOrElse(java.nio.file.Files
      .createTempDirectory("graft-run-to-final").toString)
    try {
      val spool = s"$root/spool"
      val q: StreamingQuery = streamed.writeStream
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.withColumn("__batch", lit(id)).write.mode("append").parquet(spool)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      if (!new java.io.File(spool).exists()) // empty input: no batch wrote
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          streamed.schema)
      else {
        val served = latestPerKey(spark.read.parquet(spool), keyCols)
        // before deleting the spool the result must stop depending on
        // it: an eager executor-local materialization (result rows
        // only — windows × keys, never events-sized)
        if (workDir.isEmpty)
          served.localCheckpoint(eager = true,
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        else served
      }
    } finally {
      if (workDir.isEmpty) deleteRecursively(new java.io.File(root))
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
