package graft.api

import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors}
import scala.concurrent.{ExecutionContext, Future}
import org.apache.spark.sql.SparkSession

/** Query cancellation — the `/queryGuard` admin surface
  * (`NamenodeAnalyticsMethods.java:414-437` lets an admin abort the
  * currently-tracked query). Spark-native, this is job-group
  * cancellation: each guarded query runs in its own thread under a unique
  * job group with `interruptOnCancel`, and [[cancel]] aborts every stage
  * of that group cluster-wide — Spark's mechanism for exactly this
  * admin-kill use case; no cooperative polling in operator code.
  */
object QueryGuard {

  /** A cancellable running query. */
  final case class Guarded[T](id: String, result: Future[T],
                              private[QueryGuard] val spark: SparkSession) {
    def cancel(reason: String = "cancelled by query guard"): Unit =
      QueryGuard.cancel(spark, id, reason)
  }

  private val running = new ConcurrentHashMap[String, String]()
  // Cancel intent recorded BEFORE cancelJobGroup fires: setJobGroup runs on
  // the pool thread, so a cancel() racing ahead of the bind would otherwise
  // be a silent no-op and the "cancelled" query would run to completion.
  // The body re-checks this flag after binding the group, closing the race:
  // either the flag is seen (body aborts before any job), or the group is
  // already bound and cancelJobGroup kills its stages.
  private val cancelled =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // daemon threads: a guarded query must not block JVM exit
  private val pool = ExecutionContext.fromExecutor(
    Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "graft-query-guard"); t.setDaemon(true); t
    })

  /** Thrown when a guarded query was cancelled before its first job ran. */
  final class CancelledBeforeStart(id: String)
    extends RuntimeException(s"query $id cancelled before start")

  /** Run `body` (driver-side Spark actions) under a fresh cancellable job
    * group. The group is registered until the future completes. */
  def run[T](spark: SparkSession, tag: String)(body: => T): Guarded[T] =
    runHooked(spark, tag, () => ())(body)

  /** [[run]] with a test-only hook that fires on the pool thread BEFORE the
    * job group is bound — lets the spec deterministically interleave a
    * cancel() into the pre-bind window. */
  private[graft] def runHooked[T](spark: SparkSession, tag: String,
                                beforeBind: () => Unit)(body: => T): Guarded[T] = {
    val id = s"graft-$tag-${UUID.randomUUID()}"
    running.put(id, tag)
    val fut = Future {
      beforeBind()
      // setJobGroup is thread-local: bind it on the query's own thread
      spark.sparkContext.setJobGroup(id, tag, interruptOnCancel = true)
      try {
        if (cancelled.contains(id)) throw new CancelledBeforeStart(id)
        body
      } finally {
        spark.sparkContext.clearJobGroup()
        running.remove(id)
        cancelled.remove(id)
      }
    }(pool)
    Guarded(id, fut, spark)
  }

  /** Abort all stages of a guarded query. Safe to call repeatedly; a cancel
    * that lands before the query's thread has bound its job group is
    * honored too (the body aborts at start instead of running unguarded). */
  def cancel(spark: SparkSession, id: String,
             reason: String = "cancelled by query guard"): Unit = {
    cancelled.add(id)
    spark.sparkContext.cancelJobGroup(id, reason)
    // query already finished → nothing will consume the flag; drop it
    if (!running.containsKey(id)) cancelled.remove(id)
  }

  /** Ids of queries currently registered (reference: the guard lists the
    * tracked query before killing it). */
  def list(): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    running.asScala.toSeq
  }
}
