package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed funnel — the `windowFunnel` analytics primitive (ClickHouse /
  * product-analytics engines): per user, how deep into an ordered step
  * sequence (e.g. signup → view → click → purchase) their event chain
  * reaches, with every step inside `windowNs` of the chain's start.
  *
  * Chain semantics: GREEDY EARLIEST — t₁ is the user's first step-1
  * event; t_k is the first step-k event strictly after t_{k−1} and
  * strictly inside (t₁, t₁ + window). Deterministic and order-defined,
  * so the whole operator mirrors in SQL for the oracle. NOTE: these
  * semantics deliberately DIFFER from ClickHouse's windowFunnel, which
  * effectively considers later chain starts too (any-start maximal
  * chain): a user whose first signup's window expires but whose second
  * signup completes the funnel is under-reported by greedy-earliest.
  * The oracle mirrors the same greedy rule, so the check is
  * self-consistent; an any-start variant would add one more
  * conditional-min pass per step anchored at each step-1 event.
  *
  * Shape at scale: one conditional-min hash aggregation per step, all
  * keyed on the user id — k linear passes over the event log with
  * map-side partial mins, no window over the whole log, no per-user
  * collect_list. Step k's input is pre-filtered to step k's event type,
  * so each pass aggregates only that type's slice joined against the
  * (users-reaching-step-k−1)-sized chain frame.
  */
object WindowFunnel {

  /** Per-user chain times for users reaching ALL `steps`:
    * (user_id, t1 … tk). `tsNs` must be a long (epoch nanos here;
    * any monotone unit works as long as `windowNs` matches). */
  def funnelTimes(events: DataFrame, steps: Seq[String],
                  windowNs: Long): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // fail fast on a non-long ts: cast("long") on a TimestampType yields
    // epoch SECONDS, which against a nanos window silently disables the
    // window constraint instead of erroring
    require(events.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType,
      s"ts must be a long in the same unit as windowNs, got " +
        events.schema("ts").dataType.sql)
    val base = events.select(col("user_id"),
      col("event_type"), col("ts").as("__ts"))
    val first = base.where(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("__ts")).as("t1"))
    steps.zipWithIndex.drop(1).scanLeft(first) { case (prev, (s, i)) =>
      // carry t1..ti through the aggregation (constant per user)
      val carried = (1 to i).map(j => min(col(s"t$j")).as(s"t$j"))
      base.where(col("event_type") === s)
        .join(prev, Seq("user_id"))
        .where(col("__ts") > col(s"t$i") &&
          col("__ts") < col("t1") + windowNs)
        .groupBy("user_id")
        .agg(carried.head,
          (carried.tail :+ min(col("__ts")).as(s"t${i + 1}")): _*)
    }
  }

  /** Funnel census: one row per step with the users reaching it —
    * (step, step_name, n_reached, user_xor). `n_reached` is monotone
    * non-increasing; reached(k) − reached(k+1) users exited at step k. */
  def funnelCensus(events: DataFrame, steps: Seq[String],
                   windowNs: Long): DataFrame =
    funnelTimes(events, steps, windowNs).zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_reached"),
          coalesce(expr("bit_xor(user_id)"), lit(0L)).as("user_xor"))
        .select(lit(i + 1L).as("step"), lit(steps(i)).as("step_name"),
          col("n_reached"), col("user_xor"))
    }.reduce(_ unionByName _)
}
