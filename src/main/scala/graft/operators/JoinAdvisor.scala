package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pre-flight join-strategy advisor: turns the aggregate-space profiles
  * (per-key counts — the same inputs as the key-skew and
  * join-cardinality profilers) into ONE concrete, deterministic
  * recommendation per candidate join, BEFORE the join is paid. At 100 TB
  * the wrong choice is a job-killer three different ways — a driver OOM
  * (broadcasting an SF-linear side), a straggler task pinned on a whale
  * key (unsalted skew), or a shuffle explosion (unnoticed fan-out) — and
  * all three are visible in the per-key count tables for the price of
  * two partial-agg shuffles. Fact rows never join here: both profile
  * sides collapse to (key, count) before anything meets.
  *
  * The decision ladder (first match wins), all thresholds integer and
  * explicit so the DuckDB oracle reproduces the advice bit-for-bit:
  *  1. a side's ROW count fits the broadcast budget → broadcast it
  *     (rows, not bytes — the caller knows row width; rows are what the
  *     count table measures exactly),
  *  2. est output ≥ fanoutMax × the larger input → cap fan-out or
  *     pre-aggregate (the join itself is the mistake),
  *  3. either side's whale key holds ≥ skewX1000Min/1000 × its fair
  *     share → salt that side's stragglers,
  *  4. otherwise → plain shuffled equi-join, no intervention.
  * Fan-out outranks skew: salting redistributes a hot key's rows but
  * cannot shrink a product explosion, so when both fire the fan-out
  * diagnosis is the actionable one.
  *
  * All ratio arithmetic rides decimal(38,0) (the sumExactLong
  * discipline): at 1e9 keys × 1e7-row whales the BIGINT cross-products
  * wrap silently while the oracle's HUGEINT stays exact.
  */
object JoinAdvisor {

  private val dec38 = DecimalType(38, 0)

  /** One advice row for `left ⋈ right` on the given keys. `pair` labels
    * the row (the caller analyzes several candidate joins and unions the
    * results). */
  def advise(left: DataFrame, lk: Column, right: DataFrame, rk: Column,
             pair: String,
             broadcastRowMax: Long = 1000000L,
             skewX1000Min: Long = 20000L,
             fanoutMax: Long = 4L): DataFrame = {
    def profile(df: DataFrame, k: Column, side: String): DataFrame =
      df.groupBy(k.as("k"))
        .agg(count(lit(1)).as(s"n_$side"))

    val a = profile(left, lk, "a")
    val b = profile(right, rk, "b")
    def sideStats(p: DataFrame, side: String): DataFrame =
      p.agg(sum(col(s"n_$side").cast(dec38)).cast("long")
          .as(s"rows_$side"),
        count(lit(1)).as(s"keys_$side"),
        max(col(s"n_$side")).as(s"max_$side"))

    val joined = a.join(b, Seq("k"))
      .agg(coalesce(sum((col("n_a") * col("n_b")).cast(dec38))
          .cast("long"), lit(0L)).as("est_rows"),
        coalesce(max(col("n_a") * col("n_b")), lit(0L)).as("max_key_rows"))

    sideStats(a, "a").crossJoin(sideStats(b, "b")).crossJoin(joined)
      .select(lit(pair).as("pair"),
        col("rows_a").as("n_left"), col("rows_b").as("n_right"),
        col("est_rows"), col("max_key_rows"),
        expr("cast(max_a as decimal(38,0)) * keys_a * 1000 div rows_a")
          .cast("long").as("skew_left_x1000"),
        expr("cast(max_b as decimal(38,0)) * keys_b * 1000 div rows_b")
          .cast("long").as("skew_right_x1000"))
      .withColumn("advice",
        when(col("n_right") <= broadcastRowMax &&
            col("n_right") <= col("n_left"), lit("broadcast_right"))
          .when(col("n_left") <= broadcastRowMax, lit("broadcast_left"))
          .when(col("est_rows") >=
            lit(fanoutMax) * greatest(col("n_left"), col("n_right")),
            lit("cap_fanout_or_preaggregate"))
          .when(greatest(col("skew_left_x1000"), col("skew_right_x1000"))
            >= skewX1000Min, lit("salt_skewed_side"))
          .otherwise(lit("shuffle_hash_join")))
  }

  /** ACT on the advice: run the join with the recommended strategy
    * applied. The ladder's rungs map to concrete plan interventions —
    * `broadcast()` hints for a row-budget-fitting side, the
    * deterministic salted join ([[graft.engine.Skew.saltedJoin]]) for a
    * whale-keyed left side, and the plain shuffled equi-join otherwise.
    * The fan-out rung does NOT silently join: a product explosion is a
    * query bug, not a strategy choice, so it throws with the measured
    * numbers unless the caller opts in (`allowFanout = true`, which
    * downgrades to the plain join).
    *
    * Every branch returns the SAME rows as `left.join(right, key)` —
    * strategy changes the plan, never the answer — which the spec pins
    * branch by branch. Returns (joined, advice) so callers can log the
    * decision that was taken.
    */
  def applyAdvised(left: DataFrame, right: DataFrame, key: String,
                   broadcastRowMax: Long = 1000000L,
                   skewX1000Min: Long = 20000L,
                   fanoutMax: Long = 4L,
                   salts: Int = 16,
                   allowFanout: Boolean = false)
      : (DataFrame, String) = {
    val row = advise(left, col(key), right, col(key), "apply",
      broadcastRowMax, skewX1000Min, fanoutMax).collect().head
    val advice = row.getAs[String]("advice")
    val joined = advice match {
      case "broadcast_right" => left.join(broadcast(right), key)
      case "broadcast_left" => broadcast(left).join(right, key)
      case "cap_fanout_or_preaggregate" if !allowFanout =>
        throw new IllegalArgumentException(
          s"join on '$key' explodes: est ${row.getAs[Long]("est_rows")} " +
          s"rows from ${row.getAs[Long]("n_left")} x " +
          s"${row.getAs[Long]("n_right")} inputs (max key " +
          s"${row.getAs[Long]("max_key_rows")}); pre-aggregate a side " +
          "or pass allowFanout = true")
      case "salt_skewed_side"
          if row.getAs[Long]("skew_left_x1000") >=
             row.getAs[Long]("skew_right_x1000") =>
        graft.engine.Skew.saltedJoin(left, right, key, salts)
      case "salt_skewed_side" =>
        // saltedJoin spreads the LEFT side — swap, then the result set
        // is identical (inner equi-join is symmetric up to column order)
        val swapped = graft.engine.Skew.saltedJoin(right, left, key, salts)
        val orig = left.join(right, key).columns
        swapped.select(orig.map(col): _*)
      case _ => left.join(right, key)
    }
    (joined, advice)
  }

  /** The DuckDB mirror of [[advise]] for one pair, same thresholds —
    * kept adjacent to the Spark ladder so the two CASE orders can never
    * drift apart silently. */
  def oracleSql(leftTable: String, lk: String, rightTable: String,
                rk: String, pair: String,
                broadcastRowMax: Long = 1000000L,
                skewX1000Min: Long = 20000L,
                fanoutMax: Long = 4L): String =
    s"""WITH a AS (SELECT $lk AS k, CAST(COUNT(*) AS BIGINT) AS n
          FROM $leftTable GROUP BY 1),
        b AS (SELECT $rk AS k, CAST(COUNT(*) AS BIGINT) AS n
          FROM $rightTable GROUP BY 1),
        sa AS (SELECT CAST(SUM(n) AS BIGINT) AS rows_a,
          CAST(COUNT(*) AS BIGINT) AS keys_a, MAX(n) AS max_a FROM a),
        sb AS (SELECT CAST(SUM(n) AS BIGINT) AS rows_b,
          CAST(COUNT(*) AS BIGINT) AS keys_b, MAX(n) AS max_b FROM b),
        j AS (SELECT CAST(COALESCE(SUM(CAST(a.n AS HUGEINT) * b.n), 0)
            AS BIGINT) AS est_rows,
          CAST(COALESCE(MAX(a.n * b.n), 0) AS BIGINT) AS max_key_rows
          FROM a JOIN b USING (k)),
        m AS (SELECT '$pair' AS pair, rows_a AS n_left, rows_b AS n_right,
          est_rows, max_key_rows,
          CAST(CAST(max_a AS HUGEINT) * keys_a * 1000 // rows_a AS BIGINT)
            AS skew_left_x1000,
          CAST(CAST(max_b AS HUGEINT) * keys_b * 1000 // rows_b AS BIGINT)
            AS skew_right_x1000
          FROM sa, sb, j)
        SELECT *, CASE
          WHEN n_right <= $broadcastRowMax AND n_right <= n_left
            THEN 'broadcast_right'
          WHEN n_left <= $broadcastRowMax THEN 'broadcast_left'
          WHEN est_rows >= $fanoutMax * GREATEST(n_left, n_right)
            THEN 'cap_fanout_or_preaggregate'
          WHEN GREATEST(skew_left_x1000, skew_right_x1000) >= $skewX1000Min
            THEN 'salt_skewed_side'
          ELSE 'shuffle_hash_join' END AS advice FROM m"""
}
