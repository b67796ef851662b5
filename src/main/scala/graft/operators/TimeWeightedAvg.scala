package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-key time-weighted average: each event's value holds until the next
  * same-key event (gap-weighted mean). Integer-exact to the ppm floor:
  * cent values × ns gaps overflow long at corpus scale, so the products
  * and sums ride decimal(38,0) (HUGEINT in the DuckDB oracle) and the
  * final division is the exact integral `div` (a decimal `/` + floor
  * would round at scale 6 first).
  *
  * TWO-PHASE — a naive Window.partitionBy(key) sorts each key's ENTIRE
  * history in one partition (keys are few ⇒ partitions are corpus-sized:
  * the single-partition-sort scale killer). Instead:
  * phase 1 windows within (key, time-bucket) — calendar-bounded
  * partitions — summing within-bucket gap contributions and keeping each
  * bucket's first ts + last (ts, value); phase 2 stitches bucket
  * BOUNDARIES with a window over the per-(key,bucket) aggregate rows
  * (days-sized, not events-sized). Same pattern as the distributed
  * prefix sum in Curation. Equal-ts ties can't straddle buckets, so the
  * stitched gap sequence is exactly the global (ts, event_id) chain.
  *
  * Input columns: (event_type, ts, event_id, v_cents). Output:
  * (event_type, n_weighted, twa_centppm). Shared by the registry query
  * `events_twa` and the ScaleBench events stage.
  */
object TimeWeightedAvg {

  def compute(events: DataFrame,
              bucketNs: Long = 86400L * 1000000000L): DataFrame = {
    val dec = DecimalType(38, 0)
    val wIn = Window
      .partitionBy("event_type", "bkt").orderBy(col("ts"), col("event_id"))
    val wAcross = Window.partitionBy("event_type").orderBy(col("bkt"))
    val perBucket = events
      .withColumn("bkt", expr(s"ts div $bucketNs"))
      .withColumn("nts", lead("ts", 1).over(wIn))
      .groupBy(col("event_type"), col("bkt"))
      .agg(
        // v_cents is cast to decimal BEFORE the multiply: a long*long
        // product wraps silently past Long.Max in non-ANSI mode, while
        // the oracle multiplies in HUGEINT — the product itself must be
        // decimal, not just the sum.
        sum(when(col("nts").isNotNull,
          col("v_cents").cast(dec) * (col("nts") - col("ts")).cast(dec)))
          .cast(dec).as("num_in"),
        sum(when(col("nts").isNotNull,
          (col("nts") - col("ts")).cast(dec))).as("den_in"),
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(struct(col("ts"), col("event_id"), col("v_cents"))).as("last"))
    perBucket
      .withColumn("next_first", lead("first_ts", 1).over(wAcross))
      .withColumn("bnum", when(col("next_first").isNotNull,
        (col("last.v_cents").cast(dec) *
          (col("next_first") - col("last.ts")).cast(dec)).cast(dec)))
      .withColumn("bden", when(col("next_first").isNotNull,
        (col("next_first") - col("last.ts")).cast(dec)))
      .groupBy(col("event_type"))
      .agg((sum(col("n_events")) - 1L).as("n_weighted"),
        (coalesce(sum(col("num_in")), lit(0).cast(dec)) +
          coalesce(sum(col("bnum")), lit(0).cast(dec))).as("num"),
        (coalesce(sum(col("den_in")), lit(0).cast(dec)) +
          coalesce(sum(col("bden")), lit(0).cast(dec))).as("den"))
      .select(col("event_type"), col("n_weighted"),
        expr("CAST((num * 1000000) div den AS BIGINT)").as("twa_centppm"))
  }
}
