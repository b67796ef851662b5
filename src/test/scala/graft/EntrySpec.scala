package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract ([[SparkEntry]]) itself: the flagship smoke
  * query answers, every oracle key backs a real query, and the three
  * `++`-merged registries never collide — a reused name would silently
  * SHADOW an earlier implementation and its oracle would keep passing
  * against the wrong query.
  */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry: the flagship query answers with rows (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("the three query registries never shadow each other") {
    val parts = Seq(
      "NNAQueries" -> NNAQueries.queries.keySet,
      "PipelineQueries" -> PipelineQueries.queries.keySet,
      "IngestQueries" -> IngestQueries.queries.keySet)
    for {
      Seq((an, as), (bn, bs)) <- parts.combinations(2)
      overlap = as.intersect(bs)
    } assert(overlap.isEmpty, s"$an and $bn both define: $overlap")
    val oracleParts = Seq(
      "NNAQueries" -> NNAQueries.oracleSql.keySet,
      "PipelineQueries" -> PipelineQueries.oracleSql.keySet,
      "IngestQueries" -> IngestQueries.oracleSql.keySet)
    for {
      Seq((an, as), (bn, bs)) <- oracleParts.combinations(2)
      overlap = as.intersect(bs)
    } assert(overlap.isEmpty, s"$an and $bn oracles both define: $overlap")
  }
}
