package graft.inodes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A deterministic k-cycle per-user history table derived from the current
  * namespace snapshot — the analog of the reference's suggestions-history
  * DB (`HsqlDriver.java:105-200`, `logHistoryPerUser`: one row per analysis
  * cycle per user with that user's file count and byte totals), which is
  * what its trending dashboards query. Deriving the cycles from the
  * snapshot (rather than persisting real cycles) keeps the whole family
  * oracle-checkable: [[oracleHistCte]] is the byte-equivalent DuckDB SQL.
  *
  * Relative to cycle index `c` (0 = oldest .. k-1 = newest):
  *   - files with `id % 17 = 0` appear at cycle 3       → mid-history adds;
  *   - files with `id % 19 = 3` vanish from cycle 4     → mid-history deletes;
  *   - every file's size drifts linearly by `((id % 997) - 498) * 64`
  *     bytes/cycle (signed → users mix growth and shrinkage) plus a
  *     deterministic per-(id, cycle) noise term in [-2048, 2032] so the
  *     regression in [[graft.operators.TrendAnalysis]] has to smooth real
  *     residuals rather than reproduce an exact line.
  * All arithmetic is integer-exact (longs), so Spark and DuckDB agree
  * bit-for-bit.
  */
object HistoryFixture {

  val Cycles = 6

  /** Per-cycle per-user history: (cycle, user, files, bytes). One explode
    * of the file set by `k` cycle indexes + one (cycle, user) hash
    * aggregation — map-side partials collapse to k×|users| rows, so the
    * shuffle is history-sized, not namespace-sized. */
  def cycles(spark: SparkSession, dir: String, k: Int = Cycles): DataFrame = {
    val fs = InodeView.snapshot(spark, dir).where(col("isFile"))
    fs.select(col("id"), col("user"), col("fileSize"),
        explode(sequence(lit(0), lit(k - 1))).as("cycle"))
      .where(!(col("id") % 17 === 0 && col("cycle") < 3) &&
             !(col("id") % 19 === 3 && col("cycle") >= 4))
      .withColumn("cycBytes",
        col("fileSize") + col("cycle") * ((col("id") % 997) - 498) * 64L +
          // id is reduced mod 2^32 BEFORE the ×31 so ingested namespaces
          // with near-2^63 inode ids don't overflow (ANSI mode); identity
          // for fixture ids, so the oracle mirror is unchanged in effect
          (pmod(pmod(col("id"), lit(4294967296L)) * 31 + col("cycle") * 17,
            lit(256)) - 128) * 16L)
      .groupBy(col("cycle").cast("long").as("cycle"), col("user"))
      .agg(count(lit(1)).as("files"), sum("cycBytes").as("bytes"))
  }

  /** DuckDB mirror of [[cycles]] as an extra CTE (`hist`) appended after
    * the `inodes` CTE. Any edit here MUST be mirrored above and vice
    * versa. (`%` matches Spark `pmod` because every left operand is
    * non-negative: ids are positive and `id * 31 + cycle * 17` stays far
    * below 2^63.) */
  def oracleHistCte(k: Int = Cycles): String = s"""
, hist AS (
  SELECT CAST(cc.cycle AS BIGINT) AS cycle, "user",
    CAST(COUNT(*) AS BIGINT) AS files,
    CAST(SUM(fileSize + cc.cycle * ((id % 997) - 498) * 64
             + ((id % 4294967296 * 31 + cc.cycle * 17) % 256 - 128) * 16)
         AS BIGINT) AS bytes
  FROM inodes CROSS JOIN
    (SELECT unnest(generate_series(0, ${k - 1})) AS cycle) cc
  WHERE isFile
    AND NOT (id % 17 = 0 AND cc.cycle < 3)
    AND NOT (id % 19 = 3 AND cc.cycle >= 4)
  GROUP BY cc.cycle, "user"
)
"""
}
