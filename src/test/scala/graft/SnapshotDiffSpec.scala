package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

/** Semantics + plan shape of the snapshot-delta operator. */
class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, path, user, parent, isFile, fileSize, modTime, permission, fileReplica)
  private def snap(rows: (Long, String, String, String, Boolean, Long, Long, Long, Long)*) =
    rows.toDF("id", "path", "user", "parent", "isFile", "fileSize",
      "modTime", "permission", "fileReplica")

  test("diff classifies added / deleted / modified; drops unchanged") {
    val before = snap(
      (1L, "/a/f1", "u1", "/a", true, 100L, 1000L, 644L, 3L), // unchanged
      (2L, "/a/f2", "u1", "/a", true, 200L, 1000L, 644L, 3L), // size grows
      (3L, "/a/f3", "u2", "/a", true, 300L, 1000L, 644L, 3L), // deleted
      (5L, "/a/f5", "u2", "/a", true, 500L, 1000L, 644L, 3L)) // chown u2→u3
    val after = snap(
      (1L, "/a/f1", "u1", "/a", true, 100L, 1000L, 644L, 3L),
      (2L, "/a/f2", "u1", "/a", true, 250L, 2000L, 644L, 3L),
      (4L, "/a/f4", "u1", "/a", true, 400L, 2000L, 644L, 3L), // added
      (5L, "/a/f5", "u3", "/a", true, 500L, 1000L, 644L, 3L))
    val d = SnapshotDiff.diff(before, after)
      .select("id", "change", "bytesDelta").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(d.toSeq === Seq(
      (2L, "modified", 50L), (3L, "deleted", -300L),
      (4L, "added", 400L), (5L, "modified", 0L)))
  }

  test("growthByUser attributes deltas to the post-change owner") {
    val before = snap(
      (1L, "/a/f1", "u1", "/a", true, 100L, 1000L, 644L, 3L),
      (2L, "/a/f2", "u2", "/a", true, 200L, 1000L, 644L, 3L))
    val after = snap(
      (1L, "/a/f1", "u1", "/a", true, 150L, 2000L, 644L, 3L),
      (3L, "/a/f3", "u1", "/a", true, 900L, 2000L, 644L, 3L))
    val g = SnapshotDiff.growthByUser(SnapshotDiff.diff(before, after))
      .select("user", "filesAdded", "filesDeleted", "filesModified",
        "filesDelta", "bytesDelta")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(g.toSeq === Seq(
      ("u1", 1L, 0L, 1L, 1L, 950L),
      ("u2", 0L, 1L, 0L, -1L, -200L)))
  }

  test("growthByDir groups on the depth prefix of the file's own path") {
    val before = snap((1L, "/a/b/f1", "u1", "/a/b", true, 100L, 1000L, 644L, 3L))
    val after = snap(
      (1L, "/a/b/f1", "u1", "/a/b", true, 100L, 1000L, 644L, 3L),
      (2L, "/a/b/f2", "u1", "/a/b", true, 70L, 1000L, 644L, 3L),
      (3L, "/c/d/f3", "u1", "/c/d", true, 30L, 1000L, 644L, 3L))
    val g = SnapshotDiff.growthByDir(SnapshotDiff.diff(before, after), depth = 2)
      .select("dirPath", "filesDelta", "bytesDelta")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(g.toSeq === Seq(("/a/b", 1L, 70L), ("/c/d", 1L, 30L)))
  }

  test("plan pin: diff is ONE id-keyed shuffle join — no explode, no window, " +
    "no cartesian/nested-loop") {
    // operator shape on plain inputs (nothing cached → nothing extraneous)
    val before = snap((1L, "/a/f1", "u1", "/a", true, 100L, 1000L, 644L, 3L))
    val after = snap((1L, "/a/f1", "u1", "/a", true, 150L, 2000L, 644L, 3L))
    val plan = SnapshotDiff.diff(before, after).queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    val joins = "SortMergeJoin".r.findAllIn(plan).size +
      "ShuffledHashJoin".r.findAllIn(plan).size
    assert(joins === 1, plan.linesIterator.take(20).mkString("\n"))
    assert(plan.contains("FullOuter"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
    assert(!plan.contains("Generate"))
    assert(!plan.contains("Window"))
  }

  test("plan pin: nna_snapshot_diff keeps that shape above the snapshot cache") {
    val dir = "/root/testdata/sf0.001"
    graft.inodes.InodeView.invalidate(dir)
    graft.inodes.InodeView.snapshot(spark, dir)
    val plan = SparkEntry.queries("nna_snapshot_diff")(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // everything above the cached snapshot's own (already-audited) derivation
    val head = plan.substring(0, plan.indexOf("InMemoryRelation"))
    assert(head.contains("SortMergeJoin FullOuter") ||
      head.contains("ShuffledHashJoin") && head.contains("FullOuter"), head)
    assert(!head.contains("Generate")) // no ancestor explode in the diff
    assert(!head.contains("Window"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }
}
