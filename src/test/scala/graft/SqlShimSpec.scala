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

  test("DESCRIBE returns per-set fields") {
    val f = run("DESCRIBE files").collect().map(_.getString(0)).toSet
    val d = run("DESCRIBE dirs").collect().map(_.getString(0)).toSet
    assert(f.contains("fileSize") && !d.contains("fileSize"))
    assert(d.contains("dirNumChildren") && !f.contains("dirNumChildren"))
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
}
