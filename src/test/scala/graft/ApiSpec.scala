package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api._
import graft.inodes.InodeView

class ApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  lazy val ino = InodeView.inodes(spark, dir).cache()

  test("NNAQuery path dump respects limit and ordering") {
    val r = NNAQuery.execute(
      NNAQuery(set = "files", filters = "user:eq:u1", limit = Some(10)), ino)
    val paths = r.collect().map(_.getString(0))
    assert(paths.length === 10 && paths.sorted.toSeq === paths.toSeq)
  }

  test("NNAQuery rejects invalid combos before planning") {
    intercept[IllegalArgumentException] {
      NNAQuery.execute(NNAQuery(set = "dirs", sum = Seq("fileSize")), ino)
    }
    intercept[IllegalArgumentException] {
      NNAQuery.execute(NNAQuery(set = "files", histType = Some("dirQuota")), ino)
    }
  }

  test("NNAQuery histogram top-k equals manual plan") {
    val api = NNAQuery.execute(
      NNAQuery(set = "files", histType = Some("user"),
        sum = Seq("diskspaceConsumed"), top = Some(3)), ino)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val manual = ino.where(col("isFile")).groupBy(col("user").as("key"))
      .agg(sum(col("fileSize") * col("fileReplica")).as("value"))
      .orderBy(col("value").desc, col("key").asc).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(api === manual)
  }

  test("multi-sum having addresses value columns by index") {
    val q = NNAQuery(set = "files", histType = Some("user"),
      sum = Seq("count", "fileSize"),
      histogramConditions = "0:gt:1,1:gt:1000000")
    val rows = NNAQuery.execute(q, ino).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) > 1 && r.getLong(2) > 1000000L))
  }

  test("global find rejects avg like the reference") {
    intercept[IllegalArgumentException] {
      NNAQuery.execute(NNAQuery(set = "files",
        find = Some(("avg", "fileSize"))), ino)
    }
  }

  test("NNAQuery global find min returns the arg-min inode") {
    val r = NNAQuery.execute(
      NNAQuery(set = "files", filters = "fileSize:gt:0",
        find = Some(("min", "fileSize"))), ino).head()
    val expect = ino.where(col("isFile") && col("fileSize") > 0)
      .orderBy(col("fileSize").asc, col("id").asc).limit(1)
      .select("path", "fileSize").head()
    assert(r.getString(0) === expect.getString(0))
    assert(r.getLong(1) === expect.getLong(1))
  }

  test("suggestions cachedValues is consistent with direct counts") {
    val v = Suggestions.cachedValues(ino).head()
    val files = ino.where(col("isFile"))
    assert(v.getAs[Long]("numFiles") === files.count())
    val sizeClasses = Seq("emptyFiles", "tinyFiles", "smallFiles",
      "mediumFiles", "largeFiles").map(v.getAs[Long]).sum
    assert(sizeClasses === files.count()) // classes partition all files
    assert(v.getAs[Long]("emptyFiles") ===
      files.where(col("fileSize") === 0).count())
  }

  test("renderers produce well-formed output") {
    val h = NNAQuery.execute(
      NNAQuery(set = "files", histType = Some("user"), sum = Seq("count"),
        top = Some(3)), ino)
    val json = Renderers.toJson(h)
    assert(json.startsWith("{") && json.endsWith("}") && json.contains("\": "))
    val csv = Renderers.toCsv(h)
    assert(csv.linesIterator.size === 4 && csv.startsWith("key,value"))
    val chart = Renderers.toChartJsJson(h, "t", "count")
    assert(chart.contains("\"labels\"") && chart.contains("\"datasets\""))
    val h2 = NNAQuery.execute(
      NNAQuery(set = "files", histType = Some("user"),
        histType2 = Some("fileType"), sum = Seq("count")), ino)
    val nested = Renderers.twoLevelToJson(h2.limit(5))
    assert(nested.startsWith("{") && nested.endsWith("}"))
  }

  test("CSV renders find-time values as Date unless rawTimestamps") {
    val h = NNAQuery.execute(
      NNAQuery(set = "files", histType = Some("user"),
        find = Some(("max", "modTime")), top = Some(2)), ino)
    val pretty = Renderers.toCsv(h, dateColumns = Set("value"))
    // java.util.Date.toString, e.g. "Tue Dec 31 23:59:59 UTC 2024"
    assert(pretty.linesIterator.drop(1).next().matches(".*[A-Z][a-z]{2} [A-Z][a-z]{2} .*\\d{4}.*"))
    val raw = Renderers.toCsv(h, dateColumns = Set("value"), rawTimestamps = true)
    assert(raw.linesIterator.drop(1).next().matches(".*,\\d{12,13}$"))
  }

  test("EC-aware replica grouping flags EC files") {
    import spark.implicits._
    val df = Seq((3L, false), (5L, true)).toDF("fileReplica", "hasEcPolicy")
    val got = df.select(graft.engine.Histograms.replicaKey(ecAware = true))
      .as[String].collect().sorted
    assert(got === Array("3", "EC"))
  }

  test("email conditions gate on scalar and indexed values") {
    import org.apache.spark.sql.Row
    val row = Row(120L, 5L)
    assert(Sinks.emailConditionsMet("gt:100", row))
    assert(!Sinks.emailConditionsMet("gt:100,1:gt:10", row))
    assert(Sinks.emailConditionsMet("0:gte:120,1:lt:6", row))
    var sent: Option[String] = None
    val fired = Sinks.emailIfTriggered(
      NNAQuery.execute(NNAQuery(set = "files", sum = Seq("count")), ino),
      "gt:0")(body => sent = Some(body))
    assert(fired && sent.exists(_.startsWith("count")))
  }

  test("namespace save / load / reload round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("ns").toString + "/img"
    Namespace.save(ino.limit(100), tmp)
    val back = Namespace.load(spark, tmp)
    assert(back.count() === 100)
    assert(back.columns.toSeq === ino.columns.toSeq)
    val re = Namespace.reload(spark, dir)
    assert(re.count() === ino.count())
  }

  test("history sink appends timestamped cycles") {
    val tmp = java.nio.file.Files.createTempDirectory("hist").toString + "/h"
    val perUser = Suggestions.cachedUserMaps(ino).select("user", "numFiles", "emptyFiles")
    Sinks.appendHistory(perUser, tmp, 1000000L)
    Sinks.appendHistory(perUser, tmp, 2000000L)
    val h = Sinks.readHistory(spark, tmp)
    assert(h.count() === 2 * perUser.count())
    assert(h.select("cycle_ts").distinct().count() === 2)
  }

  test("cached queries: register / refresh / latest") {
    CachedQueries.clear()
    CachedQueries.register("tiny_by_user",
      NNAQuery(set = "files", filters = "fileSize:lte:1024",
        histType = Some("user"), sum = Seq("count")))
    assert(CachedQueries.latest("tiny_by_user").isEmpty)
    CachedQueries.refresh(ino, 123L)
    val Some((ts, rows, cols)) = CachedQueries.latest("tiny_by_user")
    assert(ts === 123L && rows.nonEmpty && cols === Seq("key", "value"))
    CachedQueries.remove("tiny_by_user")
    assert(CachedQueries.list.isEmpty)
  }

  test("operations: throttled driver-side loop with abort") {
    val filtered = ino.where(col("isFile")).limit(25)
    var applied = 0
    val op = Operations.run(filtered, Operations.Delete, sleepMs = 0,
      applyFn = { _ => applied += 1; true })
    assert(op.progress._1 === 25 && applied === 25)
    // abort flag flips via the public API
    val op2 = Operations.Operation("x", Operations.Delete, "", 5, _ => true)
    op2.abort()
    assert(op2.progress._1 === 0)
  }

  test("usage metrics: per-user per-ip counters and JSON shape") {
    UsageMetrics.clear()
    UsageMetrics.userLoggedIn("alice", "10.0.0.1")
    UsageMetrics.userMadeQuery("alice", "10.0.0.1")
    UsageMetrics.userMadeQuery("alice", "10.0.0.2")
    UsageMetrics.userMadeQuery("alice", "10.0.0.1")
    UsageMetrics.userLoggedOut("alice", "10.0.0.1")
    UsageMetrics.userMadeQuery("bob", "10.0.0.3")
    val json = UsageMetrics.userMetricsJson
    assert(json ===
      """{"users": [{"userName": "alice", """ +
      """"queryCountsByIp": {"10.0.0.1": 2, "10.0.0.2": 1}, """ +
      """"loginCountsByIp": {"10.0.0.1": 1}, """ +
      """"logoutCountsByIp": {"10.0.0.1": 1}}, """ +
      """{"userName": "bob", "queryCountsByIp": {"10.0.0.3": 1}, """ +
      """"loginCountsByIp": {}, "logoutCountsByIp": {}}]}""")
    UsageMetrics.clear()
  }

  test("query guard cancels a running query promptly") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    // ~10^10-row cross product: minutes of work if not cancelled
    val guarded = QueryGuard.run(spark, "slow-cross") {
      spark.range(100000L).crossJoin(spark.range(100000L)).count()
    }
    // give the job time to start stages, then kill the group
    Thread.sleep(1500)
    assert(QueryGuard.list().exists(_._1 == guarded.id))
    val t0 = System.nanoTime()
    guarded.cancel()
    val err = intercept[Exception] {
      Await.result(guarded.result, 60.seconds)
    }
    val cancelSec = (System.nanoTime() - t0) / 1e9
    assert(cancelSec < 30, s"cancellation took ${cancelSec}s")
    assert(err.getMessage != null)
  }

  test("token last-login: service names, realUser union, max semantics") {
    import spark.implicits._
    val tokens = Seq(
      ("alice@EXAMPLE.COM", "", 100L),
      ("alice/host@EXAMPLE.COM", "", 300L),          // same service name
      ("nn/nn1.example.com@EXAMPLE.COM", "hdfs", 200L), // realUser counts too
      ("bob", "bob", 150L)                           // realUser == owner: skip
    ).toDF("owner", "realUser", "issueDate")
    val got = TokenAnalysis.lastLogins(tokens)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("alice" -> 300L, "nn" -> 200L, "hdfs" -> 200L, "bob" -> 150L))
    // no-namesystem fallback mirrors the reference's stub map
    val fb = TokenAnalysis.lastLoginsFallback(spark, 999L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fb === Map("hdfs" -> 999L, "n/a" -> -1L))
  }

  test("query guard honors a cancel that lands before the job group binds") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(1)
    @volatile var bodyRan = false
    val guarded = QueryGuard.runHooked(spark, "prebind-cancel", () => {
      started.countDown()
      gate.await() // hold the pool thread BEFORE setJobGroup
    }) { bodyRan = true; 42 }
    started.await()
    guarded.cancel() // fires while the group is not yet bound
    gate.countDown()
    val err = intercept[Exception] { Await.result(guarded.result, 30.seconds) }
    assert(err.isInstanceOf[QueryGuard.CancelledBeforeStart])
    assert(!bodyRan, "cancelled query must not run its body")
  }

  test("cached queries: one failing query does not starve the rest") {
    CachedQueries.clear()
    CachedQueries.register("good_by_user",
      NNAQuery(set = "files", histType = Some("user"), sum = Seq("count")))
    CachedQueries.register("bad_hist_type",
      NNAQuery(set = "files", histType = Some("noSuchKey"), sum = Seq("count")))
    val failures = CachedQueries.refresh(ino, 777L)
    assert(failures.keySet === Set("bad_hist_type"))
    val Some((ts, rows, _)) = CachedQueries.latest("good_by_user")
    assert(ts === 777L && rows.nonEmpty)
    assert(CachedQueries.latest("bad_hist_type").isEmpty)
    CachedQueries.clear()
  }

  test("suggestions service: scheduled cycles append history; cancel mid-cycle") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    val histDir = java.nio.file.Files.createTempDirectory("sugg").toString + "/hist"
    // two explicit cycles with distinct timestamps -> two history generations
    val c1 = SuggestionsService.cycle(spark, ino, Some(histDir), 1000L)
    val s1 = Await.result(c1.result, 120.seconds)
    val c2 = SuggestionsService.cycle(spark, ino, Some(histDir), 2000L)
    val s2 = Await.result(c2.result, 120.seconds)
    assert(s1.ts === 1000L && s2.ts === 2000L)
    assert(s1.users > 0 && s1.cachedFailures.isEmpty)
    val h = Sinks.readHistory(spark, histDir)
    assert(h.select("cycle_ts").distinct().count() === 2)
    assert(h.count() === s1.users + s2.users)
    // the scheduled loop drives cycles by itself
    var fakeNow = 10000L
    val svc = new SuggestionsService.Service(spark, ino, None, intervalMs = 100,
      clock = () => { fakeNow += 1000; fakeNow })
    svc.start()
    val deadline = System.currentTimeMillis() + 120000
    while (svc.history.size < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    svc.stop()
    assert(svc.history.size >= 2, "service loop must complete >= 2 cycles")
    assert(svc.history.map(_.ts).distinct.size === svc.history.size)
    // a cycle dies cluster-wide when cancelled mid-flight. The cancel
    // RACES the cycle's own completion — on a fully warmed box a cycle
    // can finish before the cancel lands, which is a legitimate no-op
    // (observed once in four suite runs) — so retry until one is
    // caught in flight; the first attempt wins on any cold path.
    val caught = (1 to 8).exists { i =>
      val c3 = SuggestionsService.cycle(spark, ino, None, 3000L + i)
      c3.cancel()
      try { Await.result(c3.result, 60.seconds); false }
      catch { case _: Exception => true }
    }
    assert(caught, "could not catch a cycle in flight: every cancel " +
      "landed after its cycle completed (8 attempts)")
  }

  test("suggestions service: scheduled trend cycle appends growth history " +
    "the trend operator consumes") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    val growthDir =
      java.nio.file.Files.createTempDirectory("growth").toString + "/hist"
    // two cycles over the two fixture snapshots: A (the derived previous
    // namespace) then B (the current one) — cycle 2 diffs B vs A
    val snapA = graft.inodes.SnapshotFixture.previous(spark, dir)
    val snapB = InodeView.snapshot(spark, dir)
    val c1 = SuggestionsService.cycle(spark, snapA, None, 1000L,
      prevSnapshot = None, growthHistoryPath = Some(growthDir), cycleIdx = 0L)
    Await.result(c1.result, 120.seconds)
    // first cycle has no diff base → no growth rows may exist yet
    assert(!new java.io.File(growthDir).exists())
    val c2 = SuggestionsService.cycle(spark, snapB, None, 2000L,
      prevSnapshot = Some(snapA), growthHistoryPath = Some(growthDir),
      cycleIdx = 1L)
    Await.result(c2.result, 120.seconds)
    // the appended generation IS the oracle-checked growth attribution:
    // row-for-row equal to the nna_growth_by_user query on the same pair
    val hist = spark.read.parquet(growthDir)
    assert(hist.select("cycle").distinct().collect().map(_.getLong(0)).toSeq
      === Seq(1L))
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select("user", "filesAdded", "filesDeleted", "filesModified",
          "filesDelta", "bytesDelta")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))).toMap
    val expected = keyed(NNAQueries.queries("nna_growth_by_user")(spark, dir))
    assert(keyed(hist) === expected)
    // and the trend operator consumes the table as-is: a third cycle
    // repeating the same diff (A→B) appends an identical generation at
    // cycle 2 — every user then has two flat cycles, so the regression
    // yields Delta = 0 and SlopeMilli = 0, integer-exact
    val c3 = SuggestionsService.cycle(spark, snapB, None, 3000L,
      prevSnapshot = Some(snapA), growthHistoryPath = Some(growthDir),
      cycleIdx = 2L)
    Await.result(c3.result, 120.seconds)
    val tr = graft.operators.TrendAnalysis.trend(
      spark.read.parquet(growthDir), Seq("user"), "cycle",
      Seq("bytesDelta"))
    val rows = tr.collect()
    assert(rows.map(_.getString(0)).toSet === expected.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) === 2L, s"nCycles for ${r.getString(0)}")
      assert(r.getAs[Long]("bytesDeltaDelta") === 0L)
      assert(r.getAs[Long]("bytesDeltaSlopeMilli") === 0L)
    }
  }
}
