package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine._
import graft.inodes.InodeView

// top-level so Spark can build an Encoder without an outer-scope instance
case class Ino(
  id: Long, path: String, name: String, parent: String, depth: Long,
  isFile: Boolean, user: String, group: String, permission: Long,
  accessTime: Long, modTime: Long, fileSize: Long, blockSize: Long,
  numBlocks: Long, fileReplica: Long, storagePolicyId: Long,
  isUnderConstruction: Boolean, isWithSnapshot: Boolean, hasAcl: Boolean,
  hasEcPolicy: Boolean, hasQuota: Boolean, nsQuota: Long, dsQuota: Long,
  nsQuotaUsed: Long, dsQuotaUsed: Long, dirNumChildren: Long)

/** Unit tests over tiny hand-computed frames (FIXTURES.md plan §1 "unit"). */
class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tiny: DataFrame = {
    val now = InodeView.NowMs
    val day = 86400000L
    Seq(
      Ino(1L, "/a", "a", "/", 1L, false, "hdfs", "hdfs", 755L, now - 40 * day, now - 40 * day, 0L, 0L, 0L, 0L, 0L, false, false, false, false, true, 9000L, 999L, 90L, 500L, 2L),
      Ino(2L, "/a/b", "b", "/a", 2L, false, "hdfs", "hdfs", 755L, now - 35 * day, now - 35 * day, 0L, 0L, 0L, 0L, 0L, false, false, false, false, false, -1L, -1L, 0L, 0L, 2L),
      Ino(3L, "/a/b/f1.parquet", "f1.parquet", "/a/b", 3L, true, "u1", "g1", 644L, now - 10 * day, now - 20 * day, 1024L, 1000L, 1L, 3L, 7L, false, true, false, false, false, -1L, -1L, 0L, 0L, 0L),
      Ino(4L, "/a/b/part-r-0001.txt", "part-r-0001.txt", "/a/b", 3L, true, "u2", "g1", 777L, now - 100 * day, now - 400 * day, 1048576L, 1000L, 2L, 2L, 0L, true, false, true, false, false, -1L, -1L, 0L, 0L, 0L),
      Ino(5L, "/a/c", "c", "/a", 2L, false, "hdfs", "hdfs", 755L, now - day, now - day, 0L, 0L, 0L, 0L, 0L, false, false, false, false, false, -1L, -1L, 0L, 0L, 1L),
      Ino(6L, "/a/c/_SUCCESS", "_SUCCESS", "/a/c", 3L, true, "u1", "g2", 644L, now, now, 0L, 1000L, 0L, 1L, 12L, false, false, false, false, false, -1L, -1L, 0L, 0L, 0L)
    ).toDF()
  }

  test("derived long fields: diskspace, numReplicas, memoryConsumed") {
    val r = tiny.where($"id" === 3).select(
      Fields.longField("diskspaceConsumed"),
      Fields.longField("numReplicas"),
      Fields.longField("memoryConsumed")).head()
    assert(r === Row(3072L, 3L, 300L))
    val dir = tiny.where($"id" === 1).select(Fields.longField("memoryConsumed")).head()
    assert(dir.getLong(0) === 150L)
  }

  test("quota ratio fields truncate like the reference") {
    // 90*100/9000 = 1.0 → 1 ; 500*100/999 = 50.05 → 50
    val r = tiny.where($"id" === 1).select(
      Fields.longField("nsQuotaRatioUsed"), Fields.longField("dsQuotaRatioUsed")).head()
    assert(r === Row(1L, 50L))
    // no quota → 0
    val r2 = tiny.where($"id" === 2).select(Fields.longField("nsQuotaRatioUsed")).head()
    assert(r2.getLong(0) === 0L)
  }

  test("filter compiler: long / string / bool / relative-time ops") {
    val files = tiny.where($"isFile")
    assert(files.where(Filters.compileAll("fileSize:gte:1024,fileSize:lt:1048576", "files")).count() === 1)
    assert(files.where(Filters.compileAll("name:endsWith:.parquet", "files")).count() === 1)
    assert(files.where(Filters.compileAll("path:contains:/b/", "files")).count() === 2)
    assert(files.where(Filters.compileAll("isUnderConstruction:eq:true", "files")).count() === 1)
    // modTime daysAgo:30 → files modified within 30 days: ids 3 (20d), 6 (0d)
    assert(files.where(Filters.compileAll("modTime:daysAgo:30", "files")).count() === 2)
    // accessTime olderThanDays:50 → id 4 (100d)
    assert(files.where(Filters.compileAll("accessTime:olderThanDays:50", "files")).count() === 1)
  }

  test("filter compiler: date ops compare calendar days") {
    val files = tiny.where($"isFile")
    // id=4 modTime = now-400d = 2023-11-27; dateLt 01/01/2024 matches only it
    assert(files.where(Filters.compileAll("modDate:dateLt:01/01/2024", "files")).count() === 1)
  }

  test("validity matrix rejects illegal combos") {
    intercept[IllegalArgumentException](QueryChecker.checkFilter("dirs", "fileSize", "eq"))
    intercept[IllegalArgumentException](QueryChecker.checkFilter("files", "fileSize", "startsWith"))
    intercept[IllegalArgumentException](QueryChecker.checkSum("dirs", "fileSize"))
    intercept[IllegalArgumentException](QueryChecker.checkType("files", "dirQuota"))
    intercept[IllegalArgumentException](QueryChecker.checkFind("dirs", "fileSize"))
    QueryChecker.checkFilter("files", "fileSize", "eq") // legal: no throw
    QueryChecker.checkSum("dirs", "nsQuotaRatioUsed")
  }

  test("space bucketizer edges (upper-inclusive, ascending first-match)") {
    val vals = Seq(0L, 1L, 1024L, 1025L, 1048576L, 1048577L, 1073741824L, 1073741825L)
    val got = vals.toDF("v").select(Histograms.spaceBucket($"v")).as[String].collect()
    assert(got === Array("0 B", "1 KB", "1 KB", "1 MB", "1 MB", "16 MB", "1 GB", "1 GB+"))
  }

  test("memory bucketizer edges") {
    val vals = Seq(150L, 256L, 257L, 768L, 769L, 1024L, 65536L, 65537L)
    val got = vals.toDF("v").select(Histograms.memoryBucket($"v")).as[String].collect()
    assert(got === Array("256 B", "256 B", "512 B", "768 B", "1 KB", "1 KB", "64 KB", "64 KB+"))
  }

  test("time bucketizer: weekly bins and overflow") {
    val now = InodeView.NowMs
    val day = 86400000L
    val vals = Seq(now, now - 7 * day, now - 8 * day, now - 342 * day, now - 344 * day, now + day)
    val got = vals.toDF("t").select(
      Histograms.timeBucket($"t", "weekly", now)).as[String].collect()
    assert(got === Array("1 Weeks", "1 Weeks", "2 Weeks", "49 Weeks", "49 Weeks+", "NO_MAPPING"))
  }

  test("zero-fill emits every bin in canonical order") {
    val h = Histograms.histogram(tiny.where($"isFile"),
      Histograms.timeBucket($"modTime", "yearly"), count(lit(1)))
    val filled = Histograms.zeroFillTime(spark, h, "yearly").collect()
    assert(filled.map(_.getString(0)).toSeq === Histograms.timeKeys("yearly"))
    assert(filled.map(_.getLong(1)).sum === 3)
  }

  test("fileType classifier: precedence exact > prefix > dot-suffix > underscore") {
    val names = Seq("_SUCCESS", "part-r-0001.txt", "f.parquet", "x_45454",
      "part-0", "a.unknown", "noext", "data.tar.gz", ".pig_header")
    val got = names.toDF("name").select(FileTypes.classify($"name")).as[String].collect()
    assert(got === Array("_SUCCESS", "PART_R", "PARQUET", "APP_LOG",
      "UNKNOWN", "UNKNOWN", "UNKNOWN", "GZIP", "PIG_HEADER"))
  }

  test("parentDir at depth with NO_MAPPING for shallow inodes") {
    val got = tiny.select(Histograms.parentDirAtDepth($"path", 2)).as[String].collect()
    assert(got === Array("NO_MAPPING", "NO_MAPPING", "/a/b", "/a/b", "NO_MAPPING", "/a/c"))
  }

  test("quota ancestry: files under the quota dir only") {
    val under = PathStructure.underQuota(tiny, "nsQuota")
    // /a has nsQuota → every inode strictly below /a qualifies (not /a itself)
    assert(under.select("path").as[String].collect().sorted ===
      Array("/a/b", "/a/b/f1.parquet", "/a/b/part-r-0001.txt", "/a/c", "/a/c/_SUCCESS"))
  }

  test("subtree stats aggregate all ancestors in one pass") {
    val stats = PathStructure.subtreeStats(tiny).orderBy("path").collect()
    // /a: 3 files, bytes 1024+1048576+0 ; /a/b: 2 files ; /a/c: 1 file
    assert(stats.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq === Seq(
      ("/a", 1049600L, 3L), ("/a/b", 1049600L, 2L), ("/a/c", 0L, 1L)))
  }

  test("depth-bounded subtree stats equal the full stats at kept depths") {
    val full = PathStructure.subtreeStats(tiny)
      .where(expr("size(split(path, '/')) - 1") <= 1)
      .orderBy("path").collect().toSeq
    val pruned = PathStructure.subtreeStats(tiny, maxDepth = 1)
      .orderBy("path").collect().toSeq
    assert(pruned === full)
    assert(pruned.map(_.getString(0)) === Seq("/a")) // depth-1 dirs only
  }

  test("what-if transform rewrites replica-derived fields for matches only") {
    val tf = Transforms.transformedField("user:eq:u1", "files", 10L)
    val r = tiny.where($"isFile").agg(
      sum(tf("diskspaceConsumed")), sum(tf("numReplicas"))).head()
    // u1 files: id3 (1024*10), id6 (0*10); u2 file id4 keeps 1048576*2
    assert(r.getLong(0) === 1024L * 10 + 1048576L * 2)
    assert(r.getLong(1) === 1L * 10 + 0L * 10 + 2L * 2)
  }

  test("global find picks arg-min/arg-max inode with id tiebreak") {
    val mx = Aggregates.findInode(tiny.where($"isFile"), "max", "fileSize").head()
    assert(mx.getString(0) === "/a/b/part-r-0001.txt" && mx.getLong(1) === 1048576L)
    // two files tie at fileSize extremes? min: ids 6 (0 bytes) — smallest id wins among ties
    val mn = Aggregates.findInode(tiny.where($"isFile"), "min", "fileSize").head()
    assert(mn.getString(0) === "/a/c/_SUCCESS" && mn.getLong(1) === 0L)
  }

  test("divide emits exact ppm ratio") {
    val f = tiny.where($"isFile")
    val r = Aggregates.divide(f.where($"fileSize" === 0), count(lit(1)), f, count(lit(1))).head()
    assert(r.getLong(0) === 333333L)
  }

  test("contentSummary counts the subtree under a path") {
    val r = Aggregates.contentSummary(tiny, "/a/b").head()
    assert(r === Row(2L, 1L, 1049600L, 2100224L))
  }
}
