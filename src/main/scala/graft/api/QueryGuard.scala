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
  // daemon threads: a guarded query must not block JVM exit
  private val pool = ExecutionContext.fromExecutor(
    Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "graft-query-guard"); t.setDaemon(true); t
    })

  /** Run `body` (driver-side Spark actions) under a fresh cancellable job
    * group. The group is registered until the future completes. */
  def run[T](spark: SparkSession, tag: String)(body: => T): Guarded[T] = {
    val id = s"graft-$tag-${UUID.randomUUID()}"
    running.put(id, tag)
    val fut = Future {
      // setJobGroup is thread-local: bind it on the query's own thread
      spark.sparkContext.setJobGroup(id, tag, interruptOnCancel = true)
      try body
      finally {
        spark.sparkContext.clearJobGroup()
        running.remove(id)
      }
    }(pool)
    Guarded(id, fut, spark)
  }

  /** Abort all stages of a guarded query. Safe to call repeatedly. */
  def cancel(spark: SparkSession, id: String,
             reason: String = "cancelled by query guard"): Unit =
    spark.sparkContext.cancelJobGroup(id, reason)

  /** Ids of queries currently registered (reference: the guard lists the
    * tracked query before killing it). */
  def list(): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    running.asScala.toSeq
  }
}
