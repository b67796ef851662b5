package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

object RangeJoinRewrite {
  /** Kill switch (default on). */
  val EnabledKey = "spark.graft.rangeJoin.rewrite"
  /** Bucket width in the point/bound unit (default 1 h in epoch-nanos).
    * Unlike [[graft.operators.RangeJoin.rangeJoinAuto]] the rule cannot
    * run a data-collecting aggregation mid-optimization, so the width is
    * a conf; set it ≈ the p95 interval span of the workload. */
  val WidthKey = "spark.graft.rangeJoin.bucketNs"
  val DefaultWidthNs: Long = 3600L * 1000 * 1000 * 1000
}

/** Optimizer rule: rewrite a naive range (point-in-interval) join into the
  * bucketized equi-join of [[graft.operators.RangeJoin]] — automatically,
  * for plain SQL/DataFrame code the engine never saw.
  *
  * Spark plans `points JOIN intervals ON p BETWEEN s AND e` as
  * BroadcastNestedLoopJoin: every point row is checked against every
  * interval row — quadratic work, and the whole interval side must fit in
  * one broadcast. This rule (injected via [[graft.GraftExtensions]],
  * preference order (c) of the build plan: a `Rule[LogicalPlan]` where
  * composition can't reach — the user's query is already written) detects
  * the shape and rewrites:
  *
  *   1. the interval side sprouts a `Generate(Explode(Sequence(⌊s/w⌋,
  *      ⌊e/w⌋)))` — each interval covers `span/w + 1` bucket ids;
  *   2. the join gains the equi-conjunct `⌊p/w⌋ = bucket`, turning
  *      BroadcastNestedLoop into a plain shuffled-hash/sort-merge join
  *      that Catalyst + AQE size like any other;
  *   3. the ORIGINAL range predicate stays in the condition, filtering
  *      survivors exactly; a point meets a covering interval in exactly
  *      one bucket (its own), so no pair dedup is needed;
  *   4. a Project restores the original output (drops the bucket id).
  *
  * Two shapes are recognized, both requiring NO equi-conjunct (one equi
  * key already gives Spark a hash join — the rewrite would only add
  * fan-out); strict and inclusive bounds both qualify (the preserved
  * original predicate keeps exactness):
  *
  *   - POINT-IN-INTERVAL: a lower and an upper bound on the SAME long
  *     column of one side by two long columns of the other
  *     (`t BETWEEN s AND e`);
  *   - INTERVAL OVERLAP: `ls ≤ re AND rs ≤ le` crosswise across the
  *     sides — BOTH sides explode to their covered buckets, and the pair
  *     is kept only in the canonical bucket of `max(ls, rs)` (the
  *     intersection's left edge), making emission exactly-once with no
  *     dedup shuffle.
  * Floor division is computed as `(x − pmod(x, w)) div w`, which agrees
  * with mathematical floor for NEGATIVE values too — plain `div` truncates
  * toward zero and would silently drop qualifying pairs (same hazard
  * documented on `RangeJoin.guardedBucket`, solved here without the
  * per-row error branch because the rule must never fail a query it
  * rewrites on the user's behalf). Invalid (`s > e`) and null-bounded
  * intervals are filtered before the explode — they can match nothing in
  * the original join, and `Sequence` with a positive step would throw on
  * a descending range.
  */
class RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  import RangeJoinRewrite._

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledKey, "true").toBoolean
  private def widthNs: Long =
    // clamp: width ≤ 0 would make floorDiv emit null buckets and the
    // rewritten join silently match NOTHING — a misconfiguration must
    // not become a correctness bug
    math.max(1L,
      SQLConf.get.getConfString(WidthKey, DefaultWidthNs.toString).toLong)

  /** Normalize a comparison conjunct to (big, small) ≡ big ≥ small.
    * Bounds are arbitrary side-local expressions, not just columns —
    * `ts BETWEEN s AND s + 600` is the common inline-interval spelling. */
  private def asGe(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(a, b) => Some((a, b))
    case GreaterThan(a, b)        => Some((a, b))
    case LessThanOrEqual(a, b)    => Some((b, a))
    case LessThan(a, b)           => Some((b, a))
    case _ => None
  }

  /** The expression evaluates on `side` alone: references nonempty (a
    * one-side-only or constant bound would have been pushed below the
    * join already) and wholly from that side; deterministic, long. */
  private def onSide(x: Expression, side: LogicalPlan): Boolean =
    x.dataType == LongType && x.deterministic &&
      x.references.nonEmpty && x.references.subsetOf(side.outputSet)

  /** Floor division exact for negatives: x − pmod(x,w) is the greatest
    * multiple of w at or below x, so the truncating div is exact on it. */
  private def floorDiv(x: Expression, w: Literal): Expression =
    IntegralDivide(Subtract(x, Pmod(x, w)), w)

  /** Bucket-exploding Generate over `side`, with the null/degenerate
    * intervals filtered first (they match nothing in the original join,
    * and Sequence throws on descending ranges). */
  private def explodeBuckets(side: LogicalPlan, s: Expression, e: Expression,
                             w: Literal, bucket: Attribute): Generate =
    Generate(
      // Sequence is TimeZoneAware: it stays UNRESOLVED until the tz is
      // filled, and ResolveTimeZone never re-runs in the optimizer — set
      // it here (irrelevant for pure longs)
      Explode(new Sequence(floorDiv(s, w), floorDiv(e, w),
        Some(Literal(1L, LongType)),
        Some(SQLConf.get.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bucket),
      child = Filter(And(And(IsNotNull(s), IsNotNull(e)),
        LessThanOrEqual(s, e)), side))

  private def newBucketAttr(): AttributeReference =
    AttributeReference("__graft_bucket", LongType, nullable = false)()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case _: EqualTo | _: EqualNullSafe => true
          case _ => false
        }
        if (hasEqui) j
        else {
          val bounds = conjuncts.flatMap(asGe)
          // CASE 1 — point in interval: t bounded below by s (t ≥ s) and
          // above by e (e ≥ t); t from one side, s AND e from the other
          val pointHit = (for {
            (t1, s) <- bounds
            (e, t2) <- bounds
            if t1.semanticEquals(t2) && !s.semanticEquals(e)
            pointIsLeft <-
              if (onSide(t1, left) && onSide(s, right) && onSide(e, right))
                Some(true)
              else if (onSide(t1, right) && onSide(s, left) && onSide(e, left))
                Some(false)
              else None
          } yield (t1, s, e, pointIsLeft)).headOption
          // CASE 2 — interval overlap: ls ≤ re AND rs ≤ le, crosswise
          // across the sides ([ls,le] on the left, [rs,re] on the right)
          lazy val overlapHit = (for {
            (re, ls) <- bounds // re ≥ ls
            (le, rs) <- bounds // le ≥ rs
            if !re.semanticEquals(le) && !ls.semanticEquals(rs)
            if onSide(ls, left) && onSide(le, left) &&
              onSide(rs, right) && onSide(re, right)
          } yield (ls, le, rs, re)).headOption
          val w = Literal(widthNs, LongType)
          (pointHit, overlapHit) match {
            case (Some((t, s, e, pointIsLeft)), _) =>
              val bucket = newBucketAttr()
              val interval = if (pointIsLeft) right else left
              val gen = explodeBuckets(interval, s, e, w, bucket)
              val newCond = And(EqualTo(floorDiv(t, w), bucket), cond)
              val newJoin =
                if (pointIsLeft) Join(left, gen, Inner, Some(newCond), hint)
                else Join(gen, right, Inner, Some(newCond), hint)
              Project(j.output, newJoin)
            case (None, Some((ls, le, rs, re))) =>
              // both sides explode; an overlapping pair shares EVERY
              // bucket of the intersection, so it is kept only in the
              // canonical one — the bucket of max(ls, rs), the
              // intersection's left edge (exactly-once, no dedup shuffle;
              // same trick as operators.RangeJoin.intervalOverlapJoin)
              // explode over [min(s,e), max(s,e)], NOT [s, e]: the raw
              // condition `ls ≤ re AND rs ≤ le` can hold even when an
              // interval is degenerate (s > e) — a pre-filter on s ≤ e
              // (sound for the point case) would silently drop those
              // pairs here. For every condition-satisfying pair the
              // canonical bucket ⌊max(ls,rs)/w⌋ lies inside BOTH widened
              // ranges: if max = rs then ls ≤ rs (trivially ≥ min side)
              // and rs ≤ le ≤ max(ls,le) by the condition; symmetrically
              // for max = ls.
              def explodeWidened(side: LogicalPlan, s: Expression,
                                 e: Expression, bucket: Attribute): Generate =
                Generate(
                  Explode(new Sequence(
                    floorDiv(Least(Seq(s, e)), w),
                    floorDiv(Greatest(Seq(s, e)), w),
                    Some(Literal(1L, LongType)),
                    Some(SQLConf.get.sessionLocalTimeZone))),
                  unrequiredChildIndex = Nil, outer = false,
                  qualifier = None, generatorOutput = Seq(bucket),
                  child = Filter(And(IsNotNull(s), IsNotNull(e)), side))
              val lb = newBucketAttr()
              val rb = newBucketAttr()
              val lGen = explodeWidened(left, ls, le, lb)
              val rGen = explodeWidened(right, rs, re, rb)
              val canonical =
                EqualTo(lb, floorDiv(Greatest(Seq(ls, rs)), w))
              val newCond = And(And(EqualTo(lb, rb), canonical), cond)
              Project(j.output,
                Join(lGen, rGen, Inner, Some(newCond), hint))
            case _ => j
          }
        }
    }
}
