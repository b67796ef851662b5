package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: bucket each user's events into periods (weeks by
  * default), cohort a user at their FIRST period, and count users active
  * at each (cohort, offset). One user-keyed aggregation (the per-user
  * period set is bounded by the calendar, not the event count) + one
  * explode + one cohort-keyed aggregation — no self-join of the events
  * table against itself, which is the quadratic formulation retention
  * queries usually get written as.
  *
  * Input columns: (user_id, ts). Output: (cohort_week, week_offset,
  * n_users, user_xor). Shared by the registry query `events_retention`
  * and the ScaleBench events stage.
  */
object Retention {

  def cohorts(events: DataFrame,
              periodNs: Long = 7L * 86400L * 1000000000L): DataFrame =
    events
      .select(col("user_id"), expr(s"ts div $periodNs").as("wk"))
      .groupBy(col("user_id"))
      .agg(min(col("wk")).as("cwk"), collect_set(col("wk")).as("wks"))
      .select(col("user_id"), col("cwk"), explode(col("wks")).as("wk"))
      .groupBy(col("cwk").as("cohort_week"),
        (col("wk") - col("cwk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"),
        expr("bit_xor(user_id)").as("user_xor"))
}
