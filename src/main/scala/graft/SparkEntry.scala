package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[NNAQueries]] (NNA operator inventory) and
  * [[PipelineQueries]] (LLM-data-pipeline operators); this object is the
  * stable aggregation point the driver consumes.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("nna_histogram_user")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    NNAQueries.queries ++ PipelineQueries.queries ++ IngestQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    NNAQueries.oracleSql ++ PipelineQueries.oracleSql ++ IngestQueries.oracleSql
}
