package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.JoinAdvisor

/** Every rung of the advisor's decision ladder must fire on a fixture
  * built to deserve it, and the metrics feeding the decision must be
  * exact (they are the same aggregate-space profiles the skew and
  * cardinality profilers oracle). */
class JoinAdvisorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def advice(left: org.apache.spark.sql.DataFrame,
                     right: org.apache.spark.sql.DataFrame) =
    JoinAdvisor.advise(left, col("k"), right, col("k"), "p",
      broadcastRowMax = 1000L, skewX1000Min = 20000L, fanoutMax = 4L)
      .collect().head

  test("small side -> broadcast, and the smaller of two small sides wins") {
    val big = spark.range(100000).select(col("id").as("k"))
    val dim = spark.range(500).select(col("id").as("k"))
    assert(advice(big, dim).getAs[String]("advice") === "broadcast_right")
    assert(advice(dim, big).getAs[String]("advice") === "broadcast_left")
    // both broadcastable: prefer the right side only when it's smaller
    val dim2 = spark.range(200).select(col("id").as("k"))
    assert(advice(dim, dim2).getAs[String]("advice") === "broadcast_right")
    assert(advice(dim2, dim).getAs[String]("advice") === "broadcast_left")
  }

  test("many-to-many fan-out -> cap/pre-aggregate, and it outranks skew") {
    // 100 keys x 100 rows each side: est 1M >= 4 x 10k inputs; the key
    // distribution is ALSO flat, so only the fan-out rung can fire
    val m = spark.range(10000).select((col("id") % 100).as("k"))
    val r = advice(m, m)
    assert(r.getAs[String]("advice") === "cap_fanout_or_preaggregate")
    assert(r.getAs[Long]("est_rows") === 1000000L)
    // now make one side skewed too — fan-out must still win the tie
    val skewed = spark.range(10000).select(
      when(col("id") < 9000, lit(0L)).otherwise(col("id") % 100).as("k"))
    assert(advice(skewed, m).getAs[String]("advice")
      === "cap_fanout_or_preaggregate")
  }

  test("whale key without fan-out -> salt; flat keys -> plain shuffle") {
    // left: 10k rows, 1001 keys, whale key holds 9000 rows
    // (skew x1000 = 9000*1001*1000/10000 ≈ 900,900 >= 20,000);
    // right: one row per key, so est out ≈ left rows (no fan-out)
    val whale = spark.range(10000).select(
      when(col("id") < 9000, lit(0L)).otherwise(col("id")).as("k"))
    val one = spark.range(10000).select(col("id").as("k"))
    val r = advice(whale, one)
    assert(r.getAs[String]("advice") === "salt_skewed_side")
    assert(r.getAs[Long]("skew_left_x1000") >= 20000L)
    // flat 1:1 join on big sides: nothing to fix
    val flat = advice(one, spark.range(10000).select(col("id").as("k")))
    assert(flat.getAs[String]("advice") === "shuffle_hash_join")
    assert(flat.getAs[Long]("est_rows") === 10000L)
  }

  test("applyAdvised: every rung returns exactly the plain join's rows " +
      "— strategy changes the plan, never the answer") {
    import graft.operators.JoinAdvisor.applyAdvised
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
    def plain(l: org.apache.spark.sql.DataFrame,
              r: org.apache.spark.sql.DataFrame) = rows(l.join(r, "k"))

    // broadcast rung (and the result carries the hint in the plan)
    val bigL = spark.range(50000).select((col("id") % 5000).as("k"),
      col("id").as("lv"))
    val dim = spark.range(500).select(col("id").as("k"), (col("id") * 2).as("dv"))
    val (bj, badv) = applyAdvised(bigL, dim, "k", broadcastRowMax = 1000L)
    assert(badv === "broadcast_right")
    assert(rows(bj) === plain(bigL, dim))

    // salt rung: left whale key spreads; no __salt column leaks
    val whale = spark.range(20000).select(
      when(col("id") < 18000, lit(0L)).otherwise(col("id")).as("k"),
      col("id").as("lv"))
    val one = spark.range(20000).select(col("id").as("k"), (col("id") + 7).as("rv"))
    val (sj, sadv) = applyAdvised(whale, one, "k", broadcastRowMax = 100L)
    assert(sadv === "salt_skewed_side")
    assert(!sj.columns.contains("__salt"))
    assert(rows(sj) === plain(whale, one))
    // right-side whale: the swap path must preserve the plain column order
    val (sj2, sadv2) = applyAdvised(one, whale, "k", broadcastRowMax = 100L)
    assert(sadv2 === "salt_skewed_side")
    assert(sj2.columns.toSeq === one.join(whale, "k").columns.toSeq)
    assert(rows(sj2) === plain(one, whale))

    // fan-out rung refuses by default, joins plainly when opted in
    val m = spark.range(10000).select((col("id") % 100).as("k"),
      col("id").as("v"))
    val m2 = spark.range(10000).select((col("id") % 100).as("k"),
      (col("id") * 3).as("w"))
    val ex = intercept[IllegalArgumentException] {
      applyAdvised(m, m2, "k", broadcastRowMax = 100L)
    }
    assert(ex.getMessage.contains("explodes"))
    val (fj, fadv) = applyAdvised(m, m2, "k", broadcastRowMax = 100L,
      allowFanout = true)
    assert(fadv === "cap_fanout_or_preaggregate")
    assert(fj.count() === 10000L * 100L)

    // plain rung
    val flat = spark.range(20000).select(col("id").as("k"), col("id").as("x"))
    val flat2 = spark.range(20000).select(col("id").as("k"), (col("id") + 1).as("y"))
    val (pj, padv) = applyAdvised(flat, flat2, "k", broadcastRowMax = 100L)
    assert(padv === "shuffle_hash_join")
    assert(pj.count() === 20000L)
  }

  test("disjoint keys: est_rows is 0, not null, and the ladder still " +
      "resolves") {
    val a = spark.range(5000).select(col("id").as("k"))
    val b = spark.range(5000).select((col("id") + 1000000).as("k"))
    val r = advice(a, b)
    assert(r.getAs[Long]("est_rows") === 0L)
    assert(r.getAs[Long]("max_key_rows") === 0L)
    assert(r.getAs[String]("advice") === "shuffle_hash_join")
  }
}
