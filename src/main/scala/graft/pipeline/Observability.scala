package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Single-pass pipeline accounting via Spark's `Observation` API.
  *
  * A curation pipeline needs per-stage accounting — how many rows each
  * filter rejected — for every run. The naive shape is one `count()` per
  * stage: at 100 TB that is one full corpus scan *per filter*. `observe`
  * attaches the counters to the same physical plan as the filter itself,
  * so the audit rides the one action that materializes the kept rows —
  * zero extra scans, zero extra shuffles (the metrics are accumulator-
  * style, merged on the driver).
  *
  * Attribution is first-failing-stage: a row rejected by stage `i` was
  * accepted by every stage before it, so stage counts sum to
  * `total = dropped₁ + … + droppedₙ + kept` — the invariant the spec
  * asserts. (The reference has no pipeline-audit analog; this is part of
  * the beyond-the-reference training-data surface.)
  */
object Observability {

  /** Attach first-fail drop counters for `stages` (name → keep-predicate)
    * to `docs`, returning the kept rows. Counters land on `obs` after the
    * FIRST action on the returned frame (`Observation.get` blocks until
    * then). Stage predicates must be deterministic — Spark requires it for
    * observed metrics and re-attempted tasks would otherwise double-count. */
  def filterAudited(docs: DataFrame, stages: Seq[(String, Column)],
                    obs: Observation): DataFrame = {
    require(stages.nonEmpty, "at least one filter stage")
    val keepAll = stages.map(_._2).reduce(_ && _)
    val metrics: Seq[Column] = stages.zipWithIndex.map { case ((name, pred), i) =>
      val passedBefore = stages.take(i).map(_._2)
        .foldLeft(lit(true))(_ && _)
      sum(when(passedBefore && !pred, 1L).otherwise(0L)).as(s"dropped_$name")
    } :+ sum(when(keepAll, 1L).otherwise(0L)).as("kept")
    docs.observe(obs, metrics.head, metrics.tail: _*).where(keepAll)
  }

  /** Run the audited filter to completion with ONE action and return the
    * census as a small DataFrame: (stage_idx, stage, n) — one row per
    * stage's first-fail drops plus the final `kept` row. */
  def auditCensus(spark: SparkSession, docs: DataFrame,
                  stages: Seq[(String, Column)]): DataFrame = {
    val obs = Observation()
    val keptRows = filterAudited(docs, stages, obs).count() // the one pass
    val m = obs.get
    val rows = stages.zipWithIndex.map { case ((name, _), i) =>
      (i.toLong, name, m(s"dropped_$name").asInstanceOf[Long])
    } :+ ((stages.size.toLong, "kept", keptRows))
    import spark.implicits._
    rows.toDF("stage_idx", "stage", "n")
  }

  /** Streaming twin of [[filterAudited]]: `observe(name, …)` is the
    * streaming-legal form (the `Observation` helper is batch-only) — the
    * counters surface on every micro-batch via
    * `StreamingQueryProgress.observedMetrics(name)`, giving a continuous
    * ingest pipeline per-batch drop accounting with zero extra passes.
    * Summing the per-batch rows reproduces the batch census exactly
    * (counters are associative sums). */
  def filterAuditedStream(docs: DataFrame, stages: Seq[(String, Column)],
                          metricName: String = "filter_audit"): DataFrame = {
    require(stages.nonEmpty, "at least one filter stage")
    val keepAll = stages.map(_._2).reduce(_ && _)
    val metrics: Seq[Column] = stages.zipWithIndex.map { case ((name, pred), i) =>
      val passedBefore = stages.take(i).map(_._2)
        .foldLeft(lit(true))(_ && _)
      sum(when(passedBefore && !pred, 1L).otherwise(0L)).as(s"dropped_$name")
    } :+ sum(when(keepAll, 1L).otherwise(0L)).as("kept")
    docs.observe(metricName, metrics.head, metrics.tail: _*).where(keepAll)
  }

  /** The standard document-quality stage chain used by the oracle-checked
    * census — length floor, CJK language gate, latin-alpha density — each
    * expressible identically in ANSI SQL for the DuckDB oracle. */
  def standardStages(minChars: Int = 150): Seq[(String, Column)] = Seq(
    "too_short" -> (col("n_chars") >= minChars),
    "non_latin" -> (col("lang") =!= "zh"),
    "low_alpha" ->
      (length(regexp_replace(col("text"), "[^A-Za-z ]", "")) * 10L >=
        col("n_chars") * 5L))
}
