package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.inodes.InodeView

class InodeViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("one file inode per lineitem row; ids and paths unique") {
    val fs = InodeView.files(spark, dir)
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(fs.count() === n)
    assert(fs.select("id").distinct().count() === n)
    assert(fs.select("path").distinct().count() === n)
  }

  test("dirs form a 3-level tree with consistent child counts") {
    val ino = InodeView.inodes(spark, dir).cache()
    val dirs = ino.where(!col("isFile"))
    val d3 = dirs.where(col("depth") === 3)
    val d2 = dirs.where(col("depth") === 2)
    val d1 = dirs.where(col("depth") === 1)
    assert(d1.count() === 3) // returnflags A, N, R
    // every file's parent exists among d3 paths (collected sets: avoids
    // ambiguous self-join lineage on the shared plan)
    val files = ino.where(col("isFile"))
    val d3paths = d3.select("path").collect().map(_.getString(0)).toSet
    val parents = files.select("parent").distinct().collect().map(_.getString(0)).toSet
    assert((parents -- d3paths).isEmpty)
    // dirNumChildren of d3 == files per parent
    val counted = files.groupBy("parent").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d3counts = d3.select("path", "dirNumChildren")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d3counts === counted)
    ino.unpersist()
  }

  test("sets views partition the relation") {
    val ino = InodeView.inodes(spark, dir)
    val all = InodeView.inodeSet(ino, "all").count()
    val f = InodeView.inodeSet(ino, "files").count()
    val d = InodeView.inodeSet(ino, "dirs").count()
    assert(f + d === all)
    intercept[IllegalArgumentException](InodeView.inodeSet(ino, "nope"))
  }

  test("modTime is within the 2-year window before NOW") {
    val fs = InodeView.files(spark, dir)
    val r = fs.agg(min("modTime"), max("modTime")).head()
    assert(r.getLong(0) >= InodeView.NowMs - InodeView.TwoYearsMs)
    assert(r.getLong(1) <= InodeView.NowMs)
  }
}
