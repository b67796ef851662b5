package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.inodes.InodeView

/** The predicate compiler: `field:op:value` triplets → Catalyst `Column`
  * predicates — the Spark re-expression of the reference's typed-lambda
  * compiler (`JavaStreamQueryEngine.java:108-155`; op tables at
  * `AbstractQueryEngine.java:587-745`). All predicates are plain Catalyst
  * comparisons, so they push down to the parquet scan.
  *
  * Semantics parity notes:
  *  - relative-time ops (`AbstractQueryEngine.java:721-745`): `xAgo:n` keeps
  *    inodes *newer* than `now − Δ` (>=); `olderThanX:n` keeps inodes at or
  *    before `now − Δ` (<=). month = 30 days, year = 365 days.
  *  - date ops (`AbstractQueryEngine.java:603-670`): both sides rendered
  *    `MM/dd/yyyy` and compared as calendar dates.
  *  - multiple filters are AND-only (`JavaStreamQueryEngine.java:43-48`).
  */
object Filters {

  private val MinuteMs = 60000L
  private val HourMs = 3600000L
  private val DayMs = 86400000L
  private val MonthMs = 30L * DayMs
  private val YearMs = 365L * DayMs

  /** Compile one filter triplet to a Column predicate. */
  def compile(field: String, op: String, value: String,
              now: Long = InodeView.NowMs): Column = {
    if (Fields.isBoolean(field)) {
      val c = Fields.booleanField(field)
      val v = value.toBoolean
      op match {
        case "eq"    => c === v
        case "notEq" => c =!= v
        case other   => throw new IllegalArgumentException(s"bad boolean op $other")
      }
    } else if (field == "modDate" || field == "accessDate") {
      val c = to_date(Fields.stringField(field), "MM/dd/yyyy")
      val v = to_date(lit(value), "MM/dd/yyyy")
      op match {
        case "dateEq"    => c === v
        case "dateNotEq" => c =!= v
        case "dateLt"    => c < v
        case "dateLte" | "dateStart" => c <= v
        case "dateGt"    => c > v
        case "dateGte" | "dateEnd"   => c >= v
        case other => throw new IllegalArgumentException(s"bad date op $other")
      }
    } else if (Fields.isString(field)) {
      val c = Fields.stringField(field)
      op match {
        case "eq"            => c === value
        case "notEq"         => c =!= value
        case "startsWith"    => c.startsWith(value)
        case "notStartsWith" => !c.startsWith(value)
        case "endsWith"      => c.endsWith(value)
        case "notEndsWith"   => !c.endsWith(value)
        case "contains"      => c.contains(value)
        case "notContains"   => !c.contains(value)
        case other => throw new IllegalArgumentException(s"bad string op $other")
      }
    } else {
      val c = Fields.longField(field, now)
      def ago(unit: Long) = c >= lit(now - value.toLong * unit)
      def olderThan(unit: Long) = c <= lit(now - value.toLong * unit)
      op match {
        case "eq"  => c === value.toLong
        case "notEq" => c =!= value.toLong
        case "lt"  => c < value.toLong
        case "lte" => c <= value.toLong
        case "gt"  => c > value.toLong
        case "gte" => c >= value.toLong
        case "minutesAgo" => ago(MinuteMs)
        case "hoursAgo"   => ago(HourMs)
        case "daysAgo"    => ago(DayMs)
        case "monthsAgo"  => ago(MonthMs)
        case "yearsAgo"   => ago(YearMs)
        case "olderThanMinutes" => olderThan(MinuteMs)
        case "olderThanHours"   => olderThan(HourMs)
        case "olderThanDays"    => olderThan(DayMs)
        case "olderThanMonths"  => olderThan(MonthMs)
        case "olderThanYears"   => olderThan(YearMs)
        case other => throw new IllegalArgumentException(s"bad long op $other")
      }
    }
  }

  /** Parse the reference's filter-string grammar `field:op:value[,field:op:value…]`
    * (`Helper.java:235-280`) and compile to a single AND predicate. */
  def compileAll(filterString: String, set: String,
                 now: Long = InodeView.NowMs): Column = {
    if (filterString == null || filterString.isEmpty) lit(true)
    else filterString.split(',').map { triplet =>
      val parts = triplet.split(':')
      require(parts.length >= 3, s"bad filter triplet: $triplet")
      val (field, op) = (parts(0), parts(1))
      val value = parts.drop(2).mkString(":")
      QueryChecker.checkFilter(set, field, op)
      compile(field, op, value, now)
    }.reduce(_ && _)
  }
}
