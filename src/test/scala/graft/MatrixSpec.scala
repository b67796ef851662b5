package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.NNAQuery
import graft.engine.QueryChecker
import graft.inodes.InodeView

/** Enum-matrix combinatorics, mirroring the reference's exhaustive
  * valid/invalid query cross-products (`TestNNAnalyticsBase.java:1399-1617`):
  * every legal (set × filter × op), (set × histogram type × sum) and
  * (set × find) combination must compile AND execute; every illegal one
  * must be rejected before planning.
  */
class MatrixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  lazy val ino = InodeView.inodes(spark, dir).limit(200).cache()

  private val sampleValue: Map[String, String] =
    Map() // value per op kind resolved below

  private def valueFor(field: String, op: String): String =
    if (QueryChecker.FilterBoolean(field)) "true"
    else if (field == "modDate" || field == "accessDate") "01/01/2024"
    else if (op.endsWith("Ago") || op.startsWith("olderThan")) "5"
    else if (QueryChecker.FilterString(field)) "x"
    else "100"

  private def opsFor(field: String): Set[String] =
    if (QueryChecker.FilterBoolean(field)) QueryChecker.BooleanOps
    else if (field == "modDate" || field == "accessDate") QueryChecker.DateOps
    else if (QueryChecker.FilterString(field)) QueryChecker.StringOps
    else QueryChecker.LongOps

  test("every legal set × filter × op combination executes") {
    var n = 0
    for (set <- Seq("files", "dirs", "all");
         field <- QueryChecker.filterSet(set);
         op <- opsFor(field)) {
      val q = NNAQuery(set = set,
        filters = s"$field:$op:${valueFor(field, op)}", sum = Seq("count"))
      val c = NNAQuery.execute(q, ino).head().getLong(0)
      assert(c >= 0, s"$set/$field:$op")
      n += 1
    }
    assert(n > 300) // the matrix is genuinely exhaustive
  }

  test("every legal set × histogram type × sum combination executes") {
    var n = 0
    for (set <- Seq("files", "dirs", "all");
         histType <- QueryChecker.typeSet(set);
         sumField <- QueryChecker.sumSet(set)) {
      val q = NNAQuery(set = set, histType = Some(histType), sum = Seq(sumField))
      val rows = NNAQuery.execute(q, ino).count()
      assert(rows >= 0, s"$set/$histType/$sumField")
      n += 1
    }
    assert(n > 100)
  }

  test("every legal set × find combination executes (global and grouped)") {
    for (set <- Seq("files", "dirs", "all");
         findField <- QueryChecker.findSet(set);
         op <- Seq("min", "max")) {
      val global = NNAQuery(set = set, find = Some((op, findField)))
      assert(NNAQuery.execute(global, ino).count() <= 1)
      val grouped = NNAQuery(set = set, histType = Some("user"),
        find = Some((op, findField)))
      assert(NNAQuery.execute(grouped, ino).count() >= 0)
    }
  }

  test("illegal combinations are rejected for every set") {
    for (set <- Seq("files", "dirs", "all")) {
      val badFilters = (QueryChecker.FilterLong ++ QueryChecker.FilterString ++
        QueryChecker.FilterBoolean) -- QueryChecker.filterSet(set)
      badFilters.foreach { f =>
        val op = opsFor(f).head
        intercept[IllegalArgumentException] {
          NNAQuery.execute(NNAQuery(set = set,
            filters = s"$f:$op:${valueFor(f, op)}", sum = Seq("count")), ino)
        }
      }
      val badSums = (QueryChecker.SumFile ++ QueryChecker.SumDir) --
        QueryChecker.sumSet(set)
      badSums.foreach { s =>
        intercept[IllegalArgumentException] {
          NNAQuery.execute(NNAQuery(set = set, sum = Seq(s)), ino)
        }
      }
      val badTypes = (QueryChecker.TypeFile ++ QueryChecker.TypeDir) --
        QueryChecker.typeSet(set)
      badTypes.foreach { t =>
        intercept[IllegalArgumentException] {
          NNAQuery.execute(NNAQuery(set = set, histType = Some(t),
            sum = Seq("count")), ino)
        }
      }
    }
  }

  test("op/type mismatches are rejected (string op on long field, …)") {
    intercept[IllegalArgumentException](
      NNAQuery.execute(NNAQuery(set = "files",
        filters = "fileSize:contains:1", sum = Seq("count")), ino))
    intercept[IllegalArgumentException](
      NNAQuery.execute(NNAQuery(set = "files",
        filters = "name:gt:1", sum = Seq("count")), ino))
    intercept[IllegalArgumentException](
      NNAQuery.execute(NNAQuery(set = "files",
        filters = "isWithSnapshot:lt:true", sum = Seq("count")), ino))
    intercept[IllegalArgumentException](
      NNAQuery.execute(NNAQuery(set = "files",
        filters = "modDate:eq:01/01/2024", sum = Seq("count")), ino))
  }
}
