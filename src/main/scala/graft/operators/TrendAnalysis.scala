package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key growth-trend analytics over a cycle-history table — the query
  * side of the reference's suggestions-history DB
  * (`HsqlDriver.java:105-200`: one row per analysis cycle per user; its
  * dashboards answer "who is growing and how fast"). Input is any frame
  * with one row per (key, x) carrying long-valued measures; output is one
  * row per key with, for each measure `y`:
  *
  *   - `<y>First` / `<y>Last`: the measure at the smallest / largest x;
  *   - `<y>Delta`: last - first;
  *   - `<y>SlopeMilli`: the least-squares regression slope dy/dx in
  *     thousandths, `trunc(1000 * (n·Σxy - Σx·Σy) / (n·Σx² - (Σx)²))`,
  *     truncated toward zero.
  *
  * All arithmetic is integer-exact: sums are decimal(38,0) (a per-key
  * Σbytes beyond 2^63 must not wrap at 100 TB), and the slope division is
  * made exactly divisible first (subtract `pmod`) so decimal division
  * introduces no rounding — the result mirrors bit-for-bit in SQL with
  * HUGEINT arithmetic and non-negative integer division. One hash
  * aggregation, history-sized (cycles × keys), no joins.
  */
object TrendAnalysis {

  private def dec(c: Column): Column = c.cast("decimal(28,0)")

  /** Truncated-toward-zero `(1000 * num) / den` on decimal num, long den:
    * both engines divide non-negative integers, where floor and truncation
    * coincide, so DuckDB `//` mirrors this exactly. `den = n·Σx² - (Σx)²`
    * is 0 exactly when a key has one row (or one distinct x) — the slope
    * of an underdetermined series is NULL, not a crash (ANSI division) and
    * not a fabricated 0 (which would silently count as "flat"). */
  private def slopeMilli(num: Column, den: Column): Column = {
    val n1000 = abs(num) * lit(1000).cast("decimal(4,0)")
    val q = ((n1000 - pmod(n1000, den)) / den).cast("long")
    when(den === 0, lit(null).cast("long"))
      .when(num < 0, -q).otherwise(q)
  }

  /** @param hist one row per (keys, x)
    * @param keys grouping columns (e.g. user)
    * @param x    the cycle/time index column (long)
    * @param ys   measure columns (long), each producing the four outputs */
  def trend(hist: DataFrame, keys: Seq[String], x: String,
            ys: Seq[String]): DataFrame = {
    val xc = col(x)
    val shared = Seq(
      count(lit(1)).as("_n"),
      sum(xc).as("_sx"),
      sum(xc * xc).as("_sxx"))
    val perY = ys.flatMap { y =>
      val yc = col(y)
      Seq(
        min_by(yc, xc).as(s"${y}First"),
        max_by(yc, xc).as(s"${y}Last"),
        sum(dec(yc)).as(s"_sy_$y"),
        sum(dec(xc) * dec(yc)).as(s"_sxy_$y"))
    }
    val aggd = hist.groupBy(keys.map(col): _*)
      .agg((shared ++ perY).head, (shared ++ perY).tail: _*)
    val den = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val out = ys.flatMap { y =>
      val num = dec(col("_n")) * col(s"_sxy_$y") -
        dec(col("_sx")) * col(s"_sy_$y")
      Seq(
        col(s"${y}First"), col(s"${y}Last"),
        (col(s"${y}Last") - col(s"${y}First")).as(s"${y}Delta"),
        slopeMilli(num, den).as(s"${y}SlopeMilli"))
    }
    aggd.select(keys.map(col) ++ Seq(col("_n").as("nCycles")) ++ out: _*)
  }

  /** One-row census over a [[trend]] result: how many keys grow / shrink /
    * hold steady on `y` (plus how many were underdetermined — single-cycle
    * keys whose slope is NULL; every key lands in exactly one bucket), and
    * the net delta — the "what changed this quarter" headline the
    * reference's trending UI leads with. */
  def census(trended: DataFrame, y: String): DataFrame =
    trended.agg(
      count(lit(1)).as("nKeys"),
      sum(when(col(s"${y}SlopeMilli") > 0, 1L).otherwise(0L)).as("growing"),
      sum(when(col(s"${y}SlopeMilli") < 0, 1L).otherwise(0L)).as("shrinking"),
      sum(when(col(s"${y}SlopeMilli") === 0, 1L).otherwise(0L)).as("flat"),
      sum(when(col(s"${y}SlopeMilli").isNull, 1L).otherwise(0L))
        .as("undetermined"),
      sum(col(s"${y}Delta")).as("netDelta"))
}
