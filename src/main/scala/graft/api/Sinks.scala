package graft.api

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Result sinks beyond the formatters: email-alert gating (S8) and the
  * history table (S9).
  */
object Sinks {

  /** Email-alert condition check — the reference's `MailOutput.check`
    * (`analytics/MailOutput.java:52-85`): a comma-list of `op:value` (scalar
    * results) or `idx:op:value` (multi-column results), AND semantics;
    * the email is sent only when every condition holds. Transport is a
    * callback — the reference's SMTP plumbing is environment, not
    * analytics. */
  def emailConditionsMet(conditions: String, result: Row): Boolean = {
    if (conditions == null || conditions.isEmpty) return true
    conditions.split(',').forall { c =>
      val parts = c.split(':')
      val (idx, op, value) = parts.length match {
        case 2 => (0, parts(0), parts(1).toLong)
        case 3 => (parts(0).toInt, parts(1), parts(2).toLong)
        case _ => throw new IllegalArgumentException(s"bad email condition: $c")
      }
      val v = result.get(idx) match {
        case l: Long => l; case i: Int => i.toLong
        case d: Double => d.toLong
        case other => other.toString.toLong
      }
      op match {
        case "eq" => v == value
        case "neq" | "notEq" => v != value
        case "lt" => v < value;  case "lte" => v <= value
        case "gt" => v > value;  case "gte" => v >= value
        case other => throw new IllegalArgumentException(s"bad email op: $other")
      }
    }
  }

  /** Gate + deliver: evaluates the (single-row) result, invokes `send` when
    * the conditions hold. Returns whether a send happened. */
  def emailIfTriggered(result: DataFrame, conditions: String)
                      (send: String => Unit): Boolean = {
    val row = result.head()
    val fire = emailConditionsMet(conditions, row)
    if (fire) send(Renderers.toCsv(result))
    fire
  }

  /** History sink — the reference's per-cycle per-user HSQLDB inserts
    * (`analytics/HsqlDriver.logHistoryPerUser`, `HsqlDriver.java:105-200`).
    * Spark analog: append a timestamped partition to a parquet history
    * table; one file set per analysis cycle, partitioned by cycle date for
    * pruned time-range reads. */
  def appendHistory(perUser: DataFrame, historyPath: String,
                    cycleTimestampMs: Long): Unit =
    perUser
      .withColumn("cycle_ts", lit(cycleTimestampMs))
      .withColumn("cycle_date",
        date_format(timestamp_millis(lit(cycleTimestampMs)), "yyyy-MM-dd"))
      .write.mode(SaveMode.Append)
      .partitionBy("cycle_date")
      .parquet(historyPath)

  def readHistory(spark: SparkSession, historyPath: String): DataFrame =
    spark.read.parquet(historyPath)
}
