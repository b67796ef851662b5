package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational analytics over the TPC-H-ish tables plus the LLM-data-pipeline
  * operators (dedup / similarity / text analysis — BASELINE.json north star).
  * Monetary aggregates are scaled to integer cents before summing so both
  * engines sum exactly (no float-order nondeterminism).
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** extendedprice×(100−disc%) in "cent-percent" integer units. */
  private def revenueCents = round(col("l_extendedprice") * 100).cast("long") *
    (lit(100L) - round(col("l_discount") * 100).cast("long"))

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-style pricing summary: group + multi-agg, integer-exact
    "q1_pricing" -> ((s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_cents"),
          sum(revenueCents).as("sum_disc_centpct"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3-style: join + group + top-k (broadcast the small dims)
    "q3_top_orders" -> ((s, d) => {
      val cust = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey").as("orderkey"))
        .agg(sum(revenueCents).as("revenue_centpct"))
        .orderBy(col("revenue_centpct").desc, col("orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5-style: 4-way join, revenue per nation
    "q5_nation_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val nat = Tables.nation(s, d)
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(sum(revenueCents).as("revenue_centpct"),
          count(lit(1)).as("n_lineitems"))
    }),

    // ---- text analysis over `documents` ----

    // token counting (whitespace tokenizer)
    "text_tokens" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))),

    // quality scoring: length / vocabulary-diversity signals
    "text_quality" -> ((s, d) => {
      val words = split(col("text"), " ")
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_text"),
        size(words).cast("long").as("n_words"),
        size(array_distinct(words)).cast("long").as("n_distinct_words"))
    }),

    // document fingerprinting (content hash over normalized text)
    "text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), md5(lower(col("text"))).as("fingerprint"))),

    // exact dedup census: total vs content-distinct docs
    "dedup_exact" -> ((s, d) =>
      Tables.documents(s, d).agg(
        count(lit(1)).as("total_docs"),
        countDistinct(md5(col("text"))).as("distinct_docs"))),

    // exact-dup groups: fingerprints appearing more than once
    "dedup_exact_groups" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fingerprint"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
        .where(col("n_copies") > 1)
        .orderBy(col("fingerprint")))
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      ("SELECT l_returnflag, l_linestatus, " +
       "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, " +
       "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents, " +
       "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
       "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_centpct, " +
       "COUNT(*) AS count_order " +
       "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
       "GROUP BY l_returnflag, l_linestatus"),

    "q3_top_orders" ->
      ("SELECT l_orderkey AS orderkey, " +
       "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
       "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_centpct " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "WHERE c_mktsegment = 'BUILDING' " +
       "GROUP BY l_orderkey ORDER BY revenue_centpct DESC, orderkey ASC LIMIT 10"),

    "q5_nation_revenue" ->
      ("SELECT n_name AS nation, " +
       "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * " +
       "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_centpct, " +
       "COUNT(*) AS n_lineitems " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "JOIN nation ON c_nationkey = n_nationkey " +
       "GROUP BY n_name"),

    "text_tokens" ->
      "SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM documents",

    "text_quality" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_text, " +
       "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, " +
       "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_words " +
       "FROM documents"),

    "text_fingerprint" ->
      "SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents",

    "dedup_exact" ->
      ("SELECT COUNT(*) AS total_docs, " +
       "CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS distinct_docs FROM documents"),

    "dedup_exact_groups" ->
      ("SELECT md5(text) AS fingerprint, COUNT(*) AS n_copies, " +
       "MIN(doc_id) AS keeper FROM documents " +
       "GROUP BY md5(text) HAVING COUNT(*) > 1 ORDER BY fingerprint")
  )
}
