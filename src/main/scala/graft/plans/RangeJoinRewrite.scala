package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

object RangeJoinRewrite extends PredicateHelper {
  /** Kill switch (default on). */
  val EnabledKey = "spark.graft.rangeJoin.rewrite"
  /** Bucket width in the point/bound unit (default 1 h in epoch-nanos).
    * Unlike [[graft.operators.RangeJoin.rangeJoinAuto]] the rule cannot
    * run a data-collecting aggregation mid-optimization, so the width is
    * a conf. The SQL door ([[graft.engine.SqlShim]]) sets it per query
    * from `RangeJoin.autoBucketWidth` (p95 interval span); code paths
    * that bypass the door fall back to the default and the rule logs a
    * warning so the silent-fan-out hazard is at least loud. */
  val WidthKey = "spark.graft.rangeJoin.bucketNs"
  val DefaultWidthNs: Long = 3600L * 1000 * 1000 * 1000

  /** Thread-confined width override for the SQL door's tuner. Takes
    * precedence over [[WidthKey]] but is visible ONLY to optimizations
    * forced on the setting thread — other sessions/threads optimizing
    * concurrently keep their own (conf or default) width. */
  private[graft] val tunerWidth: ThreadLocal[Option[Long]] =
    ThreadLocal.withInitial(() => None)
  /** Per-row bucket fan-out cap. Intervals spanning more than this many
    * buckets ("whales") are NOT exploded — they are routed through the
    * original non-equi join against the full other side, unioned with the
    * bucketized join of the normal rows. Bounds worst-case explode memory
    * AND avoids `Sequence`'s ~2³¹-element hard failure: a mis-sized width
    * (or a genuine whale interval) degrades to the pre-rewrite plan for
    * exactly the rows that need it instead of failing the query. */
  val MaxFanoutKey = "spark.graft.rangeJoin.maxFanout"
  val DefaultMaxFanout: Long = 4096L

  /** Marks the whale-branch joins this rule creates, so the fixpoint
    * optimizer batch does not re-match them (they still carry the
    * original non-equi condition by design). */
  private[plans] val WhaleTag = TreeNodeTag[Boolean]("graft.rangeJoin.whale")

  /** A recognized naive range-join shape (no equi-conjunct present). */
  sealed trait Shape
  /** `t BETWEEN s AND e` — `t` on the point side, `s`/`e` on the other. */
  case class PointShape(t: Expression, s: Expression, e: Expression,
                        pointIsLeft: Boolean) extends Shape
  /** `ls ≤ re AND rs ≤ le` crosswise ([ls,le] left, [rs,re] right). */
  case class OverlapShape(ls: Expression, le: Expression,
                          rs: Expression, re: Expression) extends Shape

  /** The expression evaluates on `side` alone: references nonempty (a
    * one-side-only or constant bound would have been pushed below the
    * join already) and wholly from that side; deterministic, long. */
  private def onSide(x: Expression, side: LogicalPlan): Boolean =
    x.dataType == LongType && x.deterministic &&
      x.references.nonEmpty && x.references.subsetOf(side.outputSet)

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

  /** Detect a rewritable naive range join. Shared by the optimizer rule
    * and the SQL door's width auto-tuner ([[graft.engine.SqlShim]]).
    * Joins with an equi-conjunct are never a hit (one equi key already
    * gives Spark a hash join — the rewrite would only add fan-out);
    * whale-branch joins the rule itself created are skipped via tag. */
  def detect(j: Join): Option[Shape] = j match {
    case Join(left, right, Inner, Some(cond), _)
        if j.getTagValue(WhaleTag).isEmpty =>
      // pre-optimizer callers (the SQL door tunes on the ANALYZED plan)
      // still see RuntimeReplaceables like `between(t, s, e)` — expand
      // from the accessors (the `replacement` field wraps the conjuncts
      // in a With/CommonExpressionRef that hides the bound column)
      val conjuncts = splitConjunctivePredicates(cond).flatMap {
        case b: Between => Seq(GreaterThanOrEqual(b.input, b.lower),
          LessThanOrEqual(b.input, b.upper))
        case x => Seq(x)
      }
      val hasEqui = conjuncts.exists {
        case _: EqualTo | _: EqualNullSafe => true
        case _ => false
      }
      if (hasEqui) None
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
        } yield PointShape(t1, s, e, pointIsLeft)).headOption
        // CASE 2 — interval overlap: ls ≤ re AND rs ≤ le, crosswise
        lazy val overlapHit = (for {
          (re, ls) <- bounds // re ≥ ls
          (le, rs) <- bounds // le ≥ rs
          if !re.semanticEquals(le) && !ls.semanticEquals(rs)
          if onSide(ls, left) && onSide(le, left) &&
            onSide(rs, right) && onSide(re, right)
        } yield OverlapShape(ls, le, rs, re)).headOption
        pointHit.orElse(overlapHit)
      }
    case _ => None
  }

  /** Install the rule on a stock session's experimental optimizations —
    * synchronized + idempotent (the raw check-then-append pattern raced
    * under concurrent callers and could stack duplicate instances). The
    * extensions-injected path ([[graft.GraftExtensions]]) does not need
    * this; it exists for sessions built without `spark.sql.extensions`. */
  def install(spark: SparkSession): Unit = spark.synchronized {
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[RangeJoinRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RangeJoinRewrite
  }
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
  * FAN-OUT BOUND: an interval spanning more than
  * `spark.graft.rangeJoin.maxFanout` buckets (a "whale" — span ≫ width,
  * e.g. a month-long interval under the default 1 h width) is NOT
  * exploded. The rewrite splits the interval side per row:
  * normal rows take the bucketized equi-join; whale rows take the
  * ORIGINAL non-equi join (scoped to just the whales, so Spark broadcasts
  * the small side), and the two branches union. Exactly-once because the
  * split is a partition of the interval rows. This bounds explode memory
  * at `cap` rows per interval and removes `Sequence`'s ~2³¹ hard-fail —
  * a pathological width degrades to the pre-rewrite plan instead of
  * failing a query that previously completed. The whale-branch joins are
  * tagged so the fixpoint pass does not re-match them.
  *
  * Two shapes are recognized, both requiring NO equi-conjunct; strict and
  * inclusive bounds both qualify (the preserved original predicate keeps
  * exactness):
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
  private def configuredWidth: Option[Long] =
    // the SQL door's tuner overrides via a THREAD-LOCAL, not the session
    // conf: the override is visible only to the optimization the tuner
    // itself forces, so a concurrent door query can neither observe a
    // tuner-temporary value as "user-pinned" nor bake a foreign width
    // into its own plan (SqlShim.tuneRangeJoinWidth)
    RangeJoinRewrite.tunerWidth.get()
      .orElse(Option(SQLConf.get.getConfString(WidthKey, null)).map(_.toLong))
  private def widthNs: Long =
    // clamp: width ≤ 0 would make floorDiv emit null buckets and the
    // rewritten join silently match NOTHING — a misconfiguration must
    // not become a correctness bug
    math.max(1L, configuredWidth.getOrElse(DefaultWidthNs))
  private def maxFanout: Long =
    math.max(1L, SQLConf.get.getConfString(
      MaxFanoutKey, DefaultMaxFanout.toString).toLong)

  /** Floor division exact for negatives: x − pmod(x,w) is the greatest
    * multiple of w at or below x, so the truncating div is exact on it. */
  private def floorDiv(x: Expression, w: Literal): Expression =
    IntegralDivide(Subtract(x, Pmod(x, w)), w)

  /** `⌊e/w⌋ > ⌊s/w⌋ + cap` — the row fans out past the cap. The addition
    * cannot mis-wrap into a silent explode: it overflows only when
    * ⌊s/w⌋ > Long.Max − cap, and then at most `cap` bucket ids exist at
    * or above s at all, so "normal" is the true classification. */
  private def isWhale(s: Expression, e: Expression, w: Literal,
                      cap: Long): Expression =
    // LEGACY add: under ANSI the (benign, see above) wrap would throw
    GreaterThan(floorDiv(e, w),
      Add(floorDiv(s, w), Literal(cap, LongType), EvalMode.LEGACY))

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
      child = side)

  private def newBucketAttr(): AttributeReference =
    AttributeReference("__graft_bucket", LongType, nullable = false)()

  private def whaleJoin(left: LogicalPlan, right: LogicalPlan,
                        cond: Expression, hint: JoinHint): Join = {
    val wj = Join(left, right, Inner, Some(cond), hint)
    wj.setTagValue(WhaleTag, true)
    wj
  }

  private def logDefaultWidth(j: Join): Unit =
    if (configuredWidth.isEmpty)
      logWarning("RangeJoinRewrite firing with the DEFAULT bucket width " +
        s"($DefaultWidthNs ns): intervals much longer than the width fan " +
        s"out to span/width candidate rows each (capped at $maxFanout by " +
        s"$MaxFanoutKey). Set $WidthKey ≈ the p95 interval span — the SQL " +
        "door (graft.engine.SqlShim) does this automatically. Join: " +
        j.simpleString(3))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        detect(j) match {
          case Some(PointShape(t, s, e, pointIsLeft)) =>
            logDefaultWidth(j)
            val w = Literal(widthNs, LongType)
            val cap = maxFanout
            val bucket = newBucketAttr()
            val interval = if (pointIsLeft) right else left
            val valid = And(And(IsNotNull(s), IsNotNull(e)),
              LessThanOrEqual(s, e))
            val normal = Filter(And(valid,
              Not(isWhale(s, e, w, cap))), interval)
            val whales = Filter(And(valid, isWhale(s, e, w, cap)), interval)
            val gen = explodeBuckets(normal, s, e, w, bucket)
            val newCond = And(EqualTo(floorDiv(t, w), bucket), cond)
            val bucketized =
              if (pointIsLeft) Join(left, gen, Inner, Some(newCond), hint)
              else Join(gen, right, Inner, Some(newCond), hint)
            val whaled =
              if (pointIsLeft) whaleJoin(left, whales, cond, hint)
              else whaleJoin(whales, right, cond, hint)
            Union(Project(j.output, bucketized), Project(j.output, whaled))
          case Some(OverlapShape(ls, le, rs, re)) =>
            logDefaultWidth(j)
            val w = Literal(widthNs, LongType)
            val cap = maxFanout
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
            def widened(s: Expression, e: Expression) =
              (Least(Seq(s, e)), Greatest(Seq(s, e)))
            def split(side: LogicalPlan, s: Expression, e: Expression)
                : (Filter, Filter) = {
              val (lo, hi) = widened(s, e)
              val nn = And(IsNotNull(s), IsNotNull(e))
              (Filter(And(nn, Not(isWhale(lo, hi, w, cap))), side),
                Filter(And(nn, isWhale(lo, hi, w, cap)), side))
            }
            def explodeWidened(side: LogicalPlan, s: Expression,
                               e: Expression, bucket: Attribute): Generate = {
              val (lo, hi) = widened(s, e)
              explodeBuckets(side, lo, hi, w, bucket)
            }
            val (lNorm, lWhale) = split(left, ls, le)
            val (rNorm, rWhale) = split(right, rs, re)
            val lb = newBucketAttr()
            val rb = newBucketAttr()
            val lGen = explodeWidened(lNorm, ls, le, lb)
            val rGen = explodeWidened(rNorm, rs, re, rb)
            val canonical =
              EqualTo(lb, floorDiv(Greatest(Seq(ls, rs)), w))
            val newCond = And(And(EqualTo(lb, rb), canonical), cond)
            // partition of the pair space: (normal×normal) bucketized;
            // (whaleL × all right) and (normalL × whaleR) keep the
            // original condition — disjoint and complete, whales rare
            Union(Seq(
              Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint)),
              Project(j.output, whaleJoin(lWhale, right, cond, hint)),
              Project(j.output, whaleJoin(lNorm, rWhale, cond, hint))))
          case None => j
        }
    }
}
