package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.inodes.InodeView

/** SQL surface (SURVEY §2.7): the reference parses a small dialect with
  * JSQLParser and translates to its native vocabulary
  * (`sql/SqlParser.java:115-129`, `sql/INodeSqlStatementVisitor.java:50-300`).
  * We register `files`/`dirs`/`all` as temp views and let Spark SQL execute —
  * a strict superset of the dialect (OR / HAVING / joins come free) — plus a
  * thin parity layer for `SHOW TABLES`, `DESCRIBE`, and the session-style
  * `SET parentDirDepth/timeRange` statements.
  */
object SqlShim {

  /** Register the three set views for `spark.sql` queries. */
  def register(spark: SparkSession, dir: String): Unit = {
    val inodes = InodeView.snapshot(spark, dir)
    inodes.createOrReplaceTempView("all")
    inodes.where(col("isFile")).createOrReplaceTempView("files")
    inodes.where(!col("isFile")).createOrReplaceTempView("dirs")
  }

  /** Session settings of the reference dialect
    * (`INodeSqlStatementVisitor.java:68-86`). `strictParity` routes
    * statements through [[SqlDialect]] — the reference's exact translation
    * semantics (AND-only, BETWEEN/LIKE lowering, visitor-level OR
    * rejection) executed on the native query surface; off by default —
    * Spark SQL is deliberately a superset. */
  case class Session(parentDirDepth: Int = 3, timeRange: String = "weekly",
                     strictParity: Boolean = false)

  private val SetStmt = """(?i)\s*SET\s+(\w+)\s*=\s*'?([^';]+)'?\s*;?\s*""".r
  private val DescribeStmt = """(?i)\s*DESCRIBE\s+(\w+)\s*;?\s*""".r

  /** The four DESCRIBE sections of the reference (`SqlParser.java:59-107`):
    * (section, field) rows in section order, fields sorted. */
  def describe(spark: SparkSession, set: String): DataFrame = {
    import spark.implicits._
    val sections = Seq(
      "WHERE_CONDITIONS" -> QueryChecker.filterSet(set),
      "GROUP_BYS" -> QueryChecker.typeSet(set),
      "SUM_FIELDS" -> QueryChecker.sumSet(set),
      "MIN_MAX_AVG_FIELDS" -> QueryChecker.findSet(set))
    sections.flatMap { case (sec, fields) =>
      fields.toSeq.sorted.map(sec -> _)
    }.toDF("section", "field")
  }

  /** DESCRIBE as the reference's JSON shape: a 4-key object of field
    * arrays (`{"WHERE_CONDITIONS": […], "GROUP_BYS": […], …}`). */
  def describeJson(spark: SparkSession, set: String): String = {
    val rows = describe(spark, set).collect()
    rows.groupBy(_.getString(0)).toSeq
      .sortBy(r => Seq("WHERE_CONDITIONS", "GROUP_BYS", "SUM_FIELDS",
        "MIN_MAX_AVG_FIELDS").indexOf(r._1))
      .map { case (sec, rs) =>
        rs.map(_.getString(1)).mkString(s""""$sec": ["""", "\", \"", "\"]")
      }.mkString("{", ", ", "}")
  }

  /** Execute a statement: handles SHOW TABLES / DESCRIBE / SET natively;
    * other statements go through the strict dialect translator when
    * `strictParity` is set, else to Spark SQL over the registered views. */
  def execute(spark: SparkSession, dir: String, statement: String,
              session: Session = Session()): Either[Session, DataFrame] = {
    import spark.implicits._
    // the SQL door gets the range/overlap-join rewrite even on stock
    // sessions (the extensions-injected path needs spark.sql.extensions
    // set at session build); idempotent
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[graft.plans.RangeJoinRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new graft.plans.RangeJoinRewrite
    statement.trim match {
      case s if s.equalsIgnoreCase("SHOW TABLES") =>
        Right(Seq("files", "dirs").toDF("tableName"))
      case DescribeStmt(table) =>
        Right(describe(spark, table.toLowerCase))
      case SetStmt(key, value) =>
        key.toLowerCase match {
          case "parentdirdepth" => Left(session.copy(parentDirDepth = value.trim.toInt))
          case "timerange"      => Left(session.copy(timeRange = value.trim))
          case "strictparity"   => Left(session.copy(strictParity = value.trim.toBoolean))
          case other => throw new IllegalArgumentException(s"unknown SET key: $other")
        }
      case sql if session.strictParity =>
        val q = SqlDialect.toQuery(SqlDialect.parse(spark, sql),
          session.parentDirDepth, session.timeRange,
          graft.inodes.InodeView.NowMs)
        Right(graft.api.NNAQuery.execute(q, InodeView.snapshot(spark, dir)))
      case sql =>
        register(spark, dir)
        Right(spark.sql(sql))
    }
  }
}
