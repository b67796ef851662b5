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
      // scalar census: one row, two scans
      Suggestions.cachedValues(inodes, nowMs).collect()
      // per-user maps: the history generation of this cycle
      val perUser = Suggestions.cachedUserMaps(inodes, nowMs)
      historyPath.foreach(p => Sinks.appendHistory(perUser, p, nowMs))
      val users = perUser.count()
      for (prev <- prevSnapshot; gp <- growthHistoryPath)
        graft.operators.SnapshotDiff.growthByUser(
            graft.operators.SnapshotDiff.diff(prev, inodes))
          .withColumn("cycle", lit(cycleIdx))
          .write.mode(SaveMode.Append).parquet(gp)
      // user-registered queries ride the same cycle (reference
      // `performCustomQueries`); failures are per-query, not cycle-fatal
      val failures = CachedQueries.refresh(inodes, nowMs)
      CycleStats(nowMs, users, failures)
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
                      growthHistoryPath: Option[String] = None) {
    private val exec: ScheduledExecutorService =
      Executors.newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, "graft-suggestions-service")
        t.setDaemon(true); t
      }
    @volatile private var current: Option[QueryGuard.Guarded[CycleStats]] = None
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
    // step; single-threaded executor, so no synchronization needed
    private var prevSnapshot: Option[DataFrame] = None
    private var cycleIdx: Long = 0L

    private def tick(): Unit = {
      // previous cycle still running → skip this tick (no pile-up)
      if (current.exists(!_.result.isCompleted)) return
      val snap = snapshotProvider.map(_.apply()).getOrElse(inodes)
      val g = cycle(spark, snap, historyPath, clock(),
        prevSnapshot.filter(_ => growthHistoryPath.isDefined),
        growthHistoryPath, cycleIdx)
      prevSnapshot = Some(snap)
      cycleIdx += 1
      current = Some(g)
      g.result.foreach { s =>
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
