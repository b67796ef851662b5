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
  * self-consistent; [[funnelTimesAnyStart]] is the ClickHouse-parity
  * variant (every step-1 event anchors a chain), at the cost of the
  * anchor fan-out documented there.
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

  /** ANY-START chain times (ClickHouse-parity maximal chain): the chain
    * may start at EVERY step-1 event, not just the user's first — a user
    * whose first signup's window expires but whose second signup
    * completes the funnel still counts. For a FIXED anchor t₁,
    * greedy-earliest selection of each next step maximizes the remaining
    * window, so per-anchor greedy is per-anchor optimal and taking all
    * anchors yields the maximal chain depth.
    *
    * Same k linear conditional-min passes as [[funnelTimes]], now keyed
    * on (user_id, t₁). The extra cost is the anchor fan-out: each step-k
    * event joins every LIVE anchor of its user, so a bot firing m
    * step-1 events against n step-k events costs m·n rows inside that
    * user's partition. `maxAnchorsPerUser > 0` caps a user at their
    * earliest anchors (later anchors only help when earlier ones fail,
    * which the window makes increasingly unlikely); the cap's window
    * shares the first pass's user_id partitioning.
    *
    * The DEFAULT cap is [[DefaultMaxAnchors]] (64): an organic user does
    * not restart a funnel 64 times inside one window, so the cap is
    * invisible on real traffic, while a single bot with 10⁶ step-1
    * events would otherwise blow a 10⁶·n quadratic inside its partition
    * — the classic skewed-key straggler. Pass 0 to opt into unlimited
    * anchors explicitly. */
  val DefaultMaxAnchors = 64

  def funnelTimesAnyStart(events: DataFrame, steps: Seq[String],
                          windowNs: Long,
                          maxAnchorsPerUser: Int = DefaultMaxAnchors): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(events.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType,
      s"ts must be a long in the same unit as windowNs, got " +
        events.schema("ts").dataType.sql)
    val base = events.select(col("user_id"),
      col("event_type"), col("ts").as("__ts"))
    val anchors0 = base.where(col("event_type") === steps.head)
      .select(col("user_id"), col("__ts").as("t1")).distinct()
    val anchors =
      if (maxAnchorsPerUser <= 0) anchors0
      else anchors0
        .withColumn("_rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("t1").asc)))
        .where(col("_rk") <= maxAnchorsPerUser).drop("_rk")
    steps.zipWithIndex.drop(1).scanLeft(anchors) { case (prev, (s, i)) =>
      // t1 is a grouping key; t2..ti are constant per (user, t1) group
      val carried = (2 to i).map(j => min(col(s"t$j")).as(s"t$j"))
      val stepMin = min(col("__ts")).as(s"t${i + 1}")
      val grouped = base.where(col("event_type") === s)
        .join(prev, Seq("user_id"))
        .where(col("__ts") > col(s"t$i") &&
          col("__ts") < col("t1") + windowNs)
        .groupBy("user_id", "t1")
      if (carried.isEmpty) grouped.agg(stepMin)
      else grouped.agg(carried.head, (carried.tail :+ stepMin): _*)
    }
  }

  /** Any-start funnel census: one row per step with the DISTINCT users
    * having any anchor that reaches it — n_reached is ≥ the greedy
    * [[funnelCensus]] count at every step, equal when every user's first
    * chain is their best. */
  def funnelCensusAnyStart(events: DataFrame, steps: Seq[String],
                           windowNs: Long,
                           maxAnchorsPerUser: Int = DefaultMaxAnchors): DataFrame =
    funnelTimesAnyStart(events, steps, windowNs, maxAnchorsPerUser)
      .zipWithIndex.map { case (df, i) =>
        df.select("user_id").distinct()
          .agg(count(lit(1)).as("n_reached"),
            coalesce(expr("bit_xor(user_id)"), lit(0L)).as("user_xor"))
          .select(lit(i + 1L).as("step"), lit(steps(i)).as("step_name"),
            col("n_reached"), col("user_xor"))
      }.reduce(_ unionByName _)
}
