package graft.api

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.lit

/** The suggestions engine as a RUNNABLE SERVICE LOOP, not just callable
  * functions: the reference re-analyzes its namespace on a fixed cadence
  * (`SuggestionsEngine.reloadSuggestions` scheduled every
  * `suggestions.reload.sleep.ms`, default 15 min —
  * `ApplicationConfiguration.java:170`), appends per-user metrics to its
  * history DB, and re-runs user-registered cached queries in the same
  * cycle (`SuggestionsEngine.performCustomQueries`).
  *
  * Spark-native shape: one cycle = the two-scan census
  * ([[Suggestions.cachedValues]] / [[Suggestions.cachedUserMaps]]) + the
  * history append + the [[CachedQueries]] refresh, all running under ONE
  * [[QueryGuard]] job group — so an admin can kill a whole in-flight cycle
  * cluster-wide with a single cancel, exactly like `/queryGuard` aborts the
  * reference's tracked query. Each cycle's driver-side result is bounded
  * (one census row + per-user rows ≤ #users), so the loop itself holds no
  * growing state.
  */
object SuggestionsService {

  /** What a completed cycle produced (driver-side summary, bounded). */
  final case class CycleStats(ts: Long, users: Long,
                              cachedFailures: Map[String, Throwable])

  /** The census state an INCREMENTAL cycle folds onto: the 1-row scalar
    * census and the |users|-row per-user maps (both localCheckpoint'ed —
    * bounded, lineage-free), plus the age epoch PINNED at the last full
    * rebase ([[IncrementalCensus]] class doc: untouched files crossing an
    * age boundary would otherwise drift the fold) and the fold count
    * driving the rebase cadence. */
  final case class CensusState(census: DataFrame, userMaps: DataFrame,
                               asOfMs: Long, folds: Int)

  /** One INCREMENTAL cycle: O(delta + dirs) instead of O(namespace).
    * `before`/`after` are the pre/post-delta namespaces, `ops` the typed
    * edit-log slice between them ([[graft.ingest.EditLogSource]] shape).
    * The touched rows are sliced straight off the metadata scans with a
    * pushdown-friendly predicate — when the store keeps the namespace
    * partitioned by `isFile` and path-ordered (the layout
    * [[graft.operators.ZOrder]]/compaction maintain), both slices and
    * the dirs-only recompute prune to a fraction of the files. The
    * user-registered cached queries DO re-run here, every tick: the
    * reference re-executes the registry on every 15-minute cycle
    * (`SuggestionsEngine.performCustomQueries`, ~`:744-1010`), so a
    * registered query answered from yesterday's namespace would be a
    * freshness bug at the API contract level. Registered queries are
    * explicit user asks (registry-sized, not namespace-sized), so the
    * CENSUS fold staying O(delta + dirs) is unaffected — only the
    * user's own queries scan what they ask for. */
  def incrementalCycle(spark: SparkSession, before: DataFrame,
                       after: DataFrame, ops: DataFrame, state: CensusState,
                       nowMs: Long, historyPath: Option[String])
      : QueryGuard.Guarded[(CensusState, CycleStats)] =
    QueryGuard.run(spark, "suggestions-cycle-incremental") {
      val pred = IncrementalCensus.touchedPredicate(ops)
      val removed = before.where(pred)
      val added = after.where(pred)
      val census = IncrementalCensus
        .fold(state.census, removed, added, after, state.asOfMs)
        .localCheckpoint(eager = true)
      val userMaps = IncrementalCensus
        .foldUserMaps(state.userMaps, removed, added, state.asOfMs)
        .localCheckpoint(eager = true)
      historyPath.foreach(p => Sinks.appendHistory(userMaps, p, nowMs))
      val users = userMaps.count()
      // user-registered queries ride EVERY cycle, incremental included —
      // same contract as the full-rebase body (performCustomQueries)
      val failures = CachedQueries.refresh(after, nowMs)
      (CensusState(census, userMaps, state.asOfMs, state.folds + 1),
        CycleStats(nowMs, users, failures))
    }

  /** Run ONE suggestions cycle under a cancellable job group. Returns the
    * guard handle immediately; `result` completes when the cycle is done.
    * `historyPath = Some(p)` appends the per-user metrics as a timestamped
    * generation to the history sink (S9). `prevSnapshot = Some(a)` adds
    * the scheduled TREND step (the reference's `logHistoryPerUser`
    * cadence, `HsqlDriver.java:105-200`): per-user growth attribution of
    * this snapshot vs the previous cycle's, appended to
    * `growthHistoryPath` in exactly the (key, cycle, measures…) shape
    * [[graft.operators.TrendAnalysis.trend]] consumes. One full-outer
    * diff join on the stable inode id; only changed rows leave it. */
  def cycle(spark: SparkSession, inodes: DataFrame,
            historyPath: Option[String], nowMs: Long,
            prevSnapshot: Option[DataFrame] = None,
            growthHistoryPath: Option[String] = None,
            cycleIdx: Long = 0L)
      : QueryGuard.Guarded[CycleStats] =
    QueryGuard.run(spark, "suggestions-cycle") {
      cycleBody(spark, inodes, historyPath, nowMs, prevSnapshot,
        growthHistoryPath, cycleIdx)._2
    }

  /** [[cycle]] that also RETURNS the census as reusable [[CensusState]]
    * so subsequent ticks can fold edit deltas instead of rescanning
    * ([[incrementalCycle]]) — the Service's full-rebase path. */
  def cycleWithState(spark: SparkSession, inodes: DataFrame,
                     historyPath: Option[String], nowMs: Long,
                     prevSnapshot: Option[DataFrame] = None,
                     growthHistoryPath: Option[String] = None,
                     cycleIdx: Long = 0L)
      : QueryGuard.Guarded[(CensusState, CycleStats)] =
    QueryGuard.run(spark, "suggestions-cycle") {
      cycleBody(spark, inodes, historyPath, nowMs, prevSnapshot,
        growthHistoryPath, cycleIdx)
    }

  private def cycleBody(spark: SparkSession, inodes: DataFrame,
                        historyPath: Option[String], nowMs: Long,
                        prevSnapshot: Option[DataFrame],
                        growthHistoryPath: Option[String],
                        cycleIdx: Long): (CensusState, CycleStats) = {
    // scalar census: one row, two scans — kept (checkpointed) as the
    // fold base for incremental ticks
    val census = Suggestions.cachedValues(inodes, nowMs)
      .localCheckpoint(eager = true)
    // per-user maps: the history generation of this cycle
    val perUser = Suggestions.cachedUserMaps(inodes, nowMs)
      .localCheckpoint(eager = true)
    historyPath.foreach(p => Sinks.appendHistory(perUser, p, nowMs))
    // sketch row (HLL owners + GK size digest) rides the SAME full pass
    // cadence: sketches union adds but cannot subtract removals, so only
    // full-rebase cycles (this body) append — incremental folds don't.
    // Served by /sketchHistory: window distincts and moving percentiles
    // that remain answerable after this cycle's namespace is replaced.
    historyPath.foreach(p => SketchHistory.append(
      inodes.where(org.apache.spark.sql.functions.col("isFile")),
      p + "_sketch", nowMs))
    val users = perUser.count()
    for (prev <- prevSnapshot; gp <- growthHistoryPath)
      graft.operators.SnapshotDiff.growthByUser(
          graft.operators.SnapshotDiff.diff(prev, inodes))
        .withColumn("cycle", lit(cycleIdx))
        .write.mode(SaveMode.Append).parquet(gp)
    // user-registered queries ride the same cycle (reference
    // `performCustomQueries`); failures are per-query, not cycle-fatal
    val failures = CachedQueries.refresh(inodes, nowMs)
    (CensusState(census, perUser, nowMs, 0), CycleStats(nowMs, users, failures))
  }

  /** The scheduled loop. One cycle at a time (the reference serializes its
    * reload the same way); a still-running cycle skips the next tick
    * instead of piling up. Daemon-threaded: never blocks JVM exit. */
  final class Service(spark: SparkSession, inodes: DataFrame,
                      historyPath: Option[String],
                      intervalMs: Long,
                      clock: () => Long = () => System.currentTimeMillis(),
                      // refreshed namespace per tick (CDC merge / re-ingest);
                      // None = the fixed `inodes` frame every cycle
                      snapshotProvider: Option[() => DataFrame] = None,
                      growthHistoryPath: Option[String] = None,
                      // typed edit-log ops since the LAST tick — when
                      // provided, ticks fold the delta into the previous
                      // census (O(delta + dirs)) instead of rescanning the
                      // namespace; a full rebase still runs every
                      // `rebaseEveryCycles` ticks (default: daily at the
                      // reference's 15-min cadence) to re-pin the age epoch
                      editTailProvider: Option[() => DataFrame] = None,
                      rebaseEveryCycles: Int = 96) {
    private val exec: ScheduledExecutorService =
      Executors.newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, "graft-suggestions-service")
        t.setDaemon(true); t
      }
    @volatile private var current
      : Option[QueryGuard.Guarded[(CensusState, CycleStats)]] = None
    private val completed =
      new java.util.concurrent.ConcurrentLinkedQueue[CycleStats]()
    private val cycleListeners =
      new java.util.concurrent.CopyOnWriteArrayList[CycleStats => Unit]()

    /** Register a completion hook (e.g. the HTTP cache re-warm). Runs on
      * the cycle's completion thread; keep it cheap or hand off. */
    def onCycleComplete(f: CycleStats => Unit): Unit = cycleListeners.add(f)

    /** Run a cycle now (the `/refresh` path), off-schedule; skipped like
      * any tick if one is already in flight. */
    def runNow(): Unit = exec.execute(() => tick())

    /** Start ticking. First cycle fires immediately. */
    def start(): Unit =
      exec.scheduleWithFixedDelay(() => tick(), 0L, intervalMs,
        TimeUnit.MILLISECONDS)

    // previous tick's snapshot — the diff base for the scheduled trend
    // step AND the incremental fold's `before` side; single-threaded
    // executor, so no synchronization needed for the writes
    private var prevSnapshot: Option[DataFrame] = None
    private var cycleIdx: Long = 0L
    // folded census carried between ticks; volatile because the
    // WebServer's cache warmer reads it from its own thread
    @volatile private var censusState: Option[CensusState] = None

    /** The last completed cycle's census (1-row frame + per-user maps,
      * both checkpointed). The WebServer cache serves these directly —
      * with an edit tail attached, /suggestions tracks the namespace at
      * O(delta) per tick, never a namespace scan. */
    def latestCensus: Option[CensusState] = censusState

    private def tick(): Unit = {
      // previous cycle still running → skip this tick (no pile-up)
      if (current.exists(!_.result.isCompleted)) return
      val snap = snapshotProvider.map(_.apply()).getOrElse(inodes)
      val g: QueryGuard.Guarded[(CensusState, CycleStats)] =
        (censusState, prevSnapshot, editTailProvider) match {
          case (Some(st), Some(before), Some(tail))
              if st.folds < rebaseEveryCycles =>
            incrementalCycle(spark, before, snap, tail(), st, clock(),
              historyPath)
          case _ =>
            cycleWithState(spark, snap, historyPath, clock(),
              prevSnapshot.filter(_ => growthHistoryPath.isDefined),
              growthHistoryPath, cycleIdx)
        }
      prevSnapshot = Some(snap)
      cycleIdx += 1
      current = Some(g)
      g.result.foreach { case (st, s) =>
        censusState = Some(st) // BEFORE listeners: the cache re-warm reads it
        completed.add(s)
        cycleListeners.forEach(f => f(s))
      }(scala.concurrent.ExecutionContext.global)
    }

    /** Admin kill switch for the in-flight cycle (leaves the loop running;
      * the next tick starts a fresh cycle). */
    def cancelCurrent(reason: String = "suggestions cycle cancelled"): Unit =
      current.foreach(_.cancel(reason))

    /** Cycles completed so far (oldest first). */
    def history: Seq[CycleStats] = {
      import scala.jdk.CollectionConverters._
      completed.asScala.toSeq
    }

    /** Stop the loop; cancels any in-flight cycle. */
    def stop(): Unit = {
      exec.shutdownNow()
      cancelCurrent("service stopped")
    }
  }
}
