package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token last-login analysis (`/token` endpoint): per-user last-seen
  * timestamps from the NameNode's delegation tokens — the reference walks
  * `dtsm.currentTokens` and maps owner (and realUser, when present and
  * distinct) to the token issue date
  * (`security/token/delegation/TokenExtractor.java:54-90`).
  *
  * Spark-native: the token set is a DataFrame `(owner, realUser,
  * issueDate)`; the analysis is one union + groupBy-max — set-at-a-time
  * instead of the reference's locked per-entry HashMap walk (which keeps
  * the LAST iterated timestamp per user, an unspecified map order; max is
  * the deterministic intent of "last seen").
  */
object TokenAnalysis {

  /** First principal component — `new KerberosName(p).getServiceName()`:
    * `nn/host@REALM` → `nn`, `alice@REALM` → `alice`, `bob` → `bob`. */
  def serviceName(principal: Column): Column =
    regexp_extract(principal, "^([^/@]+)", 1)

  /** Per-user latest token issue date: (user, last_seen). realUser rows
    * count only when non-empty and different from owner (reference
    * `TokenExtractor.java:80-84`). */
  def lastLogins(tokens: DataFrame): DataFrame = {
    val owners = tokens.select(
      serviceName(col("owner")).as("user"), col("issueDate"))
    val reals = tokens
      .where(col("realUser").isNotNull && col("realUser") =!= "" &&
        col("realUser") =!= col("owner"))
      .select(serviceName(col("realUser")).as("user"), col("issueDate"))
    owners.unionByName(reals)
      .groupBy("user").agg(max("issueDate").as("last_seen"))
  }

  /** No-namesystem fallback (reference `TokenExtractor.java:62-69`):
    * `{hdfs: now, n/a: -1}`. */
  def lastLoginsFallback(spark: org.apache.spark.sql.SparkSession,
                         nowMs: Long): DataFrame = {
    import spark.implicits._
    Seq(("hdfs", nowMs), ("n/a", -1L)).toDF("user", "last_seen")
  }
}
