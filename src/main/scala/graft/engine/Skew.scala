package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation/join keys.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the remaining cases — a groupBy where one key holds a
  * large share of all rows (classic for per-user metrics with a `hdfs`
  * super-user, or histogram buckets like `UNKNOWN`), and broadcast-poor
  * skewed joins.
  */
object Skew {

  /** Deterministic per-row salt: hash of ALL the frame's columns. A task
    * retry recomputes the SAME salt for the same row — unlike
    * `monotonically_increasing_id()`, which renumbers rows under a partial
    * stage retry, so a row could land in a different salt bucket while
    * sibling partials survive (the classic repartition-nondeterminism
    * hazard, lost/duplicated partials). Full-row duplicates share a bucket,
    * which only narrows the spreading for exactly-identical rows — the
    * skewed-key rows that motivate salting (distinct paths/ids under one
    * hot user) hash apart. */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts))

  /** Two-phase salted aggregation for algebraic aggregates (sum/count):
    * phase 1 groups by (key, salt) — spreading a hot key over `salts`
    * reducers — phase 2 combines the partials by key. For non-skewed data
    * this costs one extra (cheap, `salts`-way smaller) shuffle stage; for
    * skewed data it removes the straggler reducer entirely. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
                salts: Int = 16): DataFrame = {
    val salted = df
      .withColumn("__salt", rowSalt(df, salts))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__partial"))
    salted.groupBy(col("key")).agg(sum(col("__partial")).as("value"))
  }

  /** Salted count variant. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame = {
    val salted = df
      .withColumn("__salt", rowSalt(df, salts))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
    salted.groupBy(col("key")).agg(sum(col("__partial")).as("value"))
  }

  /** Salted join for a skewed LEFT key against a small-ish right side:
    * left gets a deterministic salt in [0, salts); right is exploded
    * `salts`× with every salt value; join on (key, salt). Right-side
    * inflation is the price of spreading the hot left key across
    * reducers — use only when the right side is small relative to the
    * skew. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val l = left.withColumn("__salt", rowSalt(left, salts))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
