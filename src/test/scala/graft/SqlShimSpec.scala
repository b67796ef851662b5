package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SqlShim
import graft.engine.SqlShim.Session

/** SQL-dialect parity, mirroring the reference's parser tests
  * (`TestSQL.java:41-195`): SHOW TABLES / DESCRIBE / SET statements plus
  * executable SELECTs with the dialect's WHERE forms (comparisons, BETWEEN,
  * LIKE) and GROUP BY / ORDER BY / LIMIT routing.
  */
class SqlShimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def run(sql: String, s: Session = Session()) =
    SqlShim.execute(spark, dir, sql, s).toOption.get

  test("SHOW TABLES lists files and dirs") {
    assert(run("SHOW TABLES").collect().map(_.getString(0)).toSet ===
      Set("files", "dirs"))
  }

  test("DESCRIBE returns the four reference sections per set") {
    // SqlParser.java:59-107: WHERE_CONDITIONS / GROUP_BYS / SUM_FIELDS /
    // MIN_MAX_AVG_FIELDS with per-set contents
    def sections(set: String): Map[String, Set[String]] =
      run(s"DESCRIBE $set").collect()
        .groupBy(_.getString(0)).map { case (k, v) =>
          k -> v.map(_.getString(1)).toSet
        }
    val f = sections("files")
    assert(f.keySet === Set("WHERE_CONDITIONS", "GROUP_BYS", "SUM_FIELDS",
      "MIN_MAX_AVG_FIELDS"))
    assert(f("WHERE_CONDITIONS").contains("fileSize"))
    assert(f("GROUP_BYS").contains("fileType") && !f("GROUP_BYS").contains("dirQuota"))
    assert(f("SUM_FIELDS") === graft.engine.QueryChecker.SumFile)
    assert(f("MIN_MAX_AVG_FIELDS") === graft.engine.QueryChecker.FindFile)
    val d = sections("dirs")
    assert(!d("WHERE_CONDITIONS").contains("fileSize"))
    assert(d("WHERE_CONDITIONS").contains("dirNumChildren"))
    assert(d("GROUP_BYS").contains("dirQuota"))
    assert(d("SUM_FIELDS").contains("nsQuotaUsed"))
    // JSON render keeps the reference's section order
    val json = SqlShim.describeJson(spark, "files")
    assert(json.startsWith("{\"WHERE_CONDITIONS\": ["))
    assert(json.indexOf("GROUP_BYS") < json.indexOf("SUM_FIELDS"))
    assert(json.indexOf("SUM_FIELDS") < json.indexOf("MIN_MAX_AVG_FIELDS"))
  }

  test("dialect translator maps BETWEEN / LIKE / comparisons to filters") {
    import graft.engine.SqlDialect
    // LIKE forms (INodeSqlStatementVisitor.java:149-174)
    assert(SqlDialect.parse(spark,
      "SELECT COUNT(*) FROM files WHERE name LIKE '%.parquet'").filters ===
      Seq("name:endsWith:.parquet"))
    assert(SqlDialect.parse(spark,
      "SELECT COUNT(*) FROM files WHERE path LIKE '%/d4%'").filters ===
      Seq("path:contains:/d4"))
    assert(SqlDialect.parse(spark,
      "SELECT COUNT(*) FROM files WHERE name LIKE 'part-%'").filters ===
      Seq("name:startsWith:part-"))
    assert(SqlDialect.parse(spark,
      "SELECT COUNT(*) FROM files WHERE user LIKE 'u1'").filters ===
      Seq("user:eq:u1"))
    // BETWEEN lowers to gte+lte; date literals to epoch ms (:116-146)
    assert(SqlDialect.parse(spark,
      "SELECT COUNT(*) FROM files WHERE fileSize BETWEEN 10 AND 20").filters ===
      Seq("fileSize:gte:10", "fileSize:lte:20"))
    assert(SqlDialect.parse(spark,
      "SELECT COUNT(*) FROM files WHERE modTime BETWEEN DATE '1970-01-02' AND DATE '1970-01-03'")
      .filters === Seq("modTime:gte:86400000", "modTime:lte:172800000"))
    // equal bounds collapse to eq (:143-145)
    assert(SqlDialect.parse(spark,
      "SELECT COUNT(*) FROM files WHERE fileSize BETWEEN 10 AND 10").filters ===
      Seq("fileSize:eq:10"))
    // comparisons + aggregate routing
    val p = SqlDialect.parse(spark, "SELECT `user`, SUM(fileSize) FROM files " +
      "WHERE fileSize > 0 AND depth <> 3 GROUP BY `user` ORDER BY 2 DESC LIMIT 5")
    assert(p.filters === Seq("fileSize:gt:0", "depth:notEq:3"))
    assert(p.set === "files" && p.histType === Some("user"))
    assert(p.sum === Some("fileSize") && p.limit === Some(5))
    assert(p.sortAscending === Some(false))
    // MIN/MAX/AVG route to find (:260-266)
    assert(SqlDialect.parse(spark,
      "SELECT `user`, AVG(fileSize) FROM files GROUP BY `user`").find ===
      Some("avg:fileSize"))
  }

  test("strict parity path dump: SELECT path + filters + LIMIT") {
    val strict = Session(strictParity = true)
    val rows = run("SELECT path FROM files WHERE `user` = 'u1' LIMIT 7", strict)
      .collect()
    assert(rows.length === 7)
    assert(rows.map(_.getString(0)).distinct.length === 7)
    // superset mode gives the same paths for the same shape
    val sup = run("SELECT path FROM files WHERE `user` = 'u1' ORDER BY path LIMIT 7")
      .collect().map(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq === sup.toSeq) // dump sorts by path
  }

  test("strict parity executes through the native engine, same results") {
    val strict = Session(strictParity = true)
    val a = run("SELECT COUNT(*) FROM files WHERE fileSize = 0", strict)
      .head().getLong(0)
    val b = run("SELECT COUNT(*) AS c FROM files WHERE fileSize = 0")
      .head().getLong(0)
    assert(a === b && a > 0)
    val g = run("SELECT `user`, COUNT(*) FROM files GROUP BY `user` " +
      "ORDER BY 2 DESC LIMIT 3", strict).collect()
    assert(g.length === 3)
    assert(g.map(_.getLong(1)).sliding(2).forall(w => w.head >= w.last))
  }

  test("SET statements update the session") {
    val Left(s1) = SqlShim.execute(spark, dir, "SET parentDirDepth = 5;")
    assert(s1.parentDirDepth === 5)
    val Left(s2) = SqlShim.execute(spark, dir, "SET timeRange = 'monthly';", s1)
    assert(s2.timeRange === "monthly" && s2.parentDirDepth === 5)
  }

  test("SELECT with aggregates, LIKE, BETWEEN, GROUP/ORDER/LIMIT") {
    val agg = run("SELECT COUNT(*) AS c, SUM(fileSize) AS s FROM files " +
      "WHERE fileSize > 0 AND name LIKE '%.parquet'").head()
    assert(agg.getLong(0) > 0 && agg.getLong(1) > 0)
    val grouped = run("SELECT `user` AS key, COUNT(*) AS value FROM files " +
      "WHERE fileSize BETWEEN 1 AND 1000000000 " +
      "GROUP BY `user` ORDER BY value DESC LIMIT 3").collect()
    assert(grouped.length === 3)
    assert(grouped(0).getLong(1) >= grouped(2).getLong(1))
  }

  test("strict parity mode rejects OR like the reference") {
    intercept[UnsupportedOperationException] {
      SqlShim.execute(spark, dir,
        "SELECT COUNT(*) FROM files WHERE fileSize = 0 OR fileSize > 10",
        Session(strictParity = true))
    }
    // superset mode executes it happily
    assert(run("SELECT COUNT(*) AS c FROM files WHERE fileSize = 0 OR fileSize > 10")
      .head().getLong(0) > 0)
  }

  test("min/max/avg aggregates route like sum/find") {
    val r = run("SELECT MIN(fileSize) AS mn, MAX(fileSize) AS mx, " +
      "CAST(FLOOR(AVG(fileSize)) AS BIGINT) AS av FROM files WHERE fileSize > 0").head()
    assert(r.getLong(0) <= r.getLong(2) && r.getLong(2) <= r.getLong(1))
  }

  test("SQL door auto-tunes the range-join bucket width from the interval data") {
    import spark.implicits._
    val dayNs = 86400L * 1000000000L
    val monthNs = 30L * dayNs
    // planted MONTH-long intervals: under the rule's static 1 h default
    // each would fan out to ~720 bucket rows; the door must size the
    // width from the data (p95 span = exactly monthNs here — all spans
    // equal) so fan-out is ≤ 2 buckets per interval
    (0 until 20).map(i => (i.toLong, i * 35L * dayNs))
      .toDF("iid", "ws").withColumn("we", $"ws" + monthNs)
      .createOrReplaceTempView("month_ivs")
    (0 until 3000).map(i => (i.toLong, i * 6L * 3600L * 1000000000L))
      .toDF("pid", "ts").createOrReplaceTempView("door_pts")
    val sql = "SELECT pid, iid FROM door_pts JOIN month_ivs " +
      "ON ts BETWEEN ws AND we"
    val df = run(sql)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_bucket"), s"door SQL must rewrite:\n$opt")
    assert(opt.contains(monthNs.toString),
      s"expected the data-driven width $monthNs in the plan:\n$opt")
    assert(!opt.contains(
      graft.plans.RangeJoinRewrite.DefaultWidthNs.toString),
      "the static default width must not survive auto-tuning")
    // conf restored: the tuned width is baked into the memoized plan only
    assert(spark.conf.getOption(
      graft.plans.RangeJoinRewrite.WidthKey).isEmpty)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set(graft.plans.RangeJoinRewrite.EnabledKey, "false")
    val truth = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.unset(graft.plans.RangeJoinRewrite.EnabledKey)
    assert(got === truth && truth.size > 1000, s"auto-width changed results")
    // an explicitly configured width wins over the tuner
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthKey, dayNs.toString)
    try {
      val pinned = run(sql).queryExecution.optimizedPlan.toString
      assert(pinned.contains(dayNs.toString) &&
        !pinned.contains(monthNs.toString),
        "explicit width conf must not be overridden by the tuner")
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.WidthKey)
  }
}
