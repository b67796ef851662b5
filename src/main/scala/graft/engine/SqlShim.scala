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
    // set at session build); synchronized + idempotent
    graft.plans.RangeJoinRewrite.install(spark)
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
        Right(tuneRangeJoinWidth(spark, spark.sql(sql)))
    }
  }

  /** Data-driven bucket width through the SQL door: the optimizer rule
    * ([[graft.plans.RangeJoinRewrite]]) cannot run an aggregation
    * mid-optimization, so its width is a conf — and the static default
    * silently multiplies candidate fan-out by span/width on intervals
    * much longer than it. The door CAN aggregate: detect the naive
    * range-join shape in the ANALYZED plan, size the width like
    * `RangeJoin.autoBucketWidth` (p95 interval span, a 2-scalar
    * aggregate over the caller's own interval subtree), then force
    * optimization while a THREAD-LOCAL width override is set
    * ([[RangeJoinRewrite.tunerWidth]]). `QueryExecution.optimizedPlan`
    * is memoized, so the tuned width is baked into THIS query — and
    * because the override is thread-confined rather than a temporarily
    * mutated session conf, a concurrent door query can neither mistake a
    * tuner-temporary value for a user-pinned one nor bake a foreign
    * width into its own plan. An explicitly-configured width wins — the
    * tuner only fills the default. */
  private[graft] def tuneRangeJoinWidth(spark: SparkSession,
                                         df: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{ofRows, toColumn}
    import org.apache.spark.sql.catalyst.expressions.Subtract
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import graft.plans.RangeJoinRewrite
    import RangeJoinRewrite.{OverlapShape, PointShape, WidthKey}
    if (spark.conf.getOption(WidthKey).isDefined) return df
    val hits = df.queryExecution.analyzed.collect {
      case j: Join => RangeJoinRewrite.detect(j).map(j -> _)
    }.flatten
    if (hits.nonEmpty) {
      // pool every detected shape's interval spans (overlap pools both
      // sides, mirroring RangeJoin.intervalOverlapJoinAuto); with several
      // range joins in one statement the pooled p95 is a compromise —
      // per-join widths would need per-join confs the rule doesn't have
      val spans = hits.map { case (j, shape) =>
        shape match {
          case PointShape(_, s, e, pointIsLeft) =>
            val side = if (pointIsLeft) j.right else j.left
            ofRows(spark, side).select(toColumn(Subtract(e, s)).as("span"))
          case OverlapShape(ls, le, rs, re) =>
            ofRows(spark, j.left)
              .select(toColumn(Subtract(le, ls)).as("span"))
              .unionAll(ofRows(spark, j.right)
                .select(toColumn(Subtract(re, rs)).as("span")))
        }
      }.reduce(_ unionAll _)
      val r = spans.agg(expr("approx_percentile(span, 0.95)"),
        count(lit(1))).head
      val w = if (r.isNullAt(0) || r.getLong(1) == 0L) 1L
              else math.max(1L, r.getLong(0))
      // memoized optimizedPlan is NOT enough: every later action
      // (.count(), .write) builds a NEW QueryExecution over the LOGICAL
      // plan and re-optimizes on whatever thread runs it — without the
      // override, with the default width (round-8 bench measured exactly
      // that shape). Baking the tuned rewrite in structurally — the
      // returned frame is ROOTED at the tuned optimized plan — survives
      // any downstream action; re-optimization of an already-rewritten
      // plan is a no-op for the rule (rewritten joins carry its skip tag).
      RangeJoinRewrite.tunerWidth.set(Some(w))
      try ofRows(spark, df.queryExecution.optimizedPlan)
      finally RangeJoinRewrite.tunerWidth.set(None)
    } else df
  }
}
