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
    * (`INodeSqlStatementVisitor.java:68-86`). `strictParity` enforces the
    * reference's AND-only WHERE restriction (`:111-113` throws on OR);
    * off by default — Spark SQL is deliberately a superset. */
  case class Session(parentDirDepth: Int = 3, timeRange: String = "weekly",
                     strictParity: Boolean = false)

  private val SetStmt = """(?i)\s*SET\s+(\w+)\s*=\s*'?([^';]+)'?\s*;?\s*""".r
  private val DescribeStmt = """(?i)\s*DESCRIBE\s+(\w+)\s*;?\s*""".r

  /** Execute a statement: handles SHOW TABLES / DESCRIBE / SET natively,
    * everything else goes to Spark SQL over the registered views. */
  def execute(spark: SparkSession, dir: String, statement: String,
              session: Session = Session()): Either[Session, DataFrame] = {
    import spark.implicits._
    statement.trim match {
      case s if s.equalsIgnoreCase("SHOW TABLES") =>
        Right(Seq("files", "dirs").toDF("tableName"))
      case DescribeStmt(table) =>
        // per-set validity, like the reference's DESCRIBE JSON
        // (`SqlParser.java:59-107`)
        val set = table.toLowerCase
        val fields = QueryChecker.filterSet(set).toSeq.sorted
        Right(fields.toDF("field"))
      case SetStmt(key, value) =>
        key.toLowerCase match {
          case "parentdirdepth" => Left(session.copy(parentDirDepth = value.trim.toInt))
          case "timerange"      => Left(session.copy(timeRange = value.trim))
          case "strictparity"   => Left(session.copy(strictParity = value.trim.toBoolean))
          case other => throw new IllegalArgumentException(s"unknown SET key: $other")
        }
      case sql =>
        if (session.strictParity && sql.toUpperCase.matches("(?s).*\\bOR\\b.*"))
          throw new UnsupportedOperationException(
            "OR is not supported by the reference dialect (strict parity mode)")
        register(spark, dir)
        Right(spark.sql(sql))
    }
  }
}
