package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.types._

/** Mergeable quantile digest — the percentile member of the sketch-census
  * family (distinct = HLL, heavy hitters = Misra–Gries, quantiles = this).
  *
  * State is Spark's own Greenwald–Khanna summary
  * (`catalyst.util.QuantileSummaries` — the engine behind
  * `approx_percentile`), which Spark keeps internal to one aggregation:
  * the digest can't be persisted, re-merged later, or served per
  * segment. These expressions expose exactly that: [[QuantileDigestAgg]]
  * emits the summary as a portable BINARY image, [[QuantileDigestMerge]]
  * re-aggregates persisted images (associative, any merge tree), and
  * [[QuantileDigestQuery]] answers quantile queries from an image. A
  * per-segment digest table then serves "p99 over any window/grouping"
  * like the HLL census serves distinct counts: O(segments × digest
  * bytes) input, raw rows never reread.
  *
  * Guarantee (GK, preserved under merge): a query at fraction q returns
  * a value whose exact rank r satisfies |r − q·N| ≤ ε·N (ε doubles
  * under merge trees in theory; Spark's compress re-tightens — the spec
  * asserts the 2ε bound in-engine against exact ranks). `count` in the
  * digest is exact. No hashing or sampling randomness anywhere: for a
  * fixed merge tree results are bit-deterministic, and the ε-rank
  * guarantee holds for ANY merge order — parallel aggregation may vary
  * the tree, so serve-time answers can move within ε, never outside it
  * (which is why the oracle pins the rank-bound booleans plus the exact
  * count, not the quantile values themselves).
  */
object QuantileDigest {

  private[functions] def serialize(qs: QuantileSummaries): Array[Byte] = {
    val c = qs.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(c.compressThreshold)
    out.writeDouble(c.relativeError)
    out.writeLong(c.count)
    val s = c.sampled
    out.writeInt(s.length)
    var i = 0
    while (i < s.length) {
      out.writeDouble(s(i).value); out.writeLong(s(i).g)
      out.writeLong(s(i).delta); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  private[functions] def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val threshold = in.readInt()
    val eps = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val s = new Array[Stats](n)
    var i = 0
    while (i < n) {
      s(i) = Stats(in.readDouble(), in.readLong(), in.readLong()); i += 1
    }
    new QuantileSummaries(threshold, eps, s, count, true)
  }

  import org.apache.spark.sql.GraftColumnBridge._

  /** Aggregate a numeric column into a digest image (binary). */
  def quantile_digest_agg(c: Column, relativeError: Double = 0.001): Column =
    toColumn(QuantileDigestAgg(toExpression(c.cast("double")),
      relativeError).toAggregateExpression())

  /** Re-aggregate persisted digest images into one image. */
  def quantile_digest_merge_agg(c: Column): Column =
    toColumn(QuantileDigestMerge(toExpression(c)).toAggregateExpression())

  /** Query a digest image at fraction q ∈ [0,1] (null for an empty digest). */
  def quantile_digest_query(c: Column, q: Double): Column =
    toColumn(QuantileDigestQuery(toExpression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))

  /** Exact row count carried by a digest image. */
  def quantile_digest_count(c: Column): Column =
    toColumn(QuantileDigestCount(toExpression(c)))

  /** The ε recorded in a digest image (the build ε, or the trim ε if
    * the image has been through [[quantile_digest_trim]]). Lets a trim
    * policy SKIP rows it cannot tighten instead of crashing on them. */
  def quantile_digest_eps(c: Column): Column =
    toColumn(QuantileDigestEps(toExpression(c)))

  /** Re-compress a digest image at a coarser target ε — the
    * bounded-SIZE knob for long-compacted serving tables. GK summaries
    * are not fully mergeable (Agarwal et al. 2012): entries merged from
    * m inputs carry accumulated deltas that saturate the original-ε
    * compression threshold, so image bytes grow ~linearly in m.
    * Trimming re-runs the compression with threshold 2·ε_trim·N, which
    * collapses the accreted entries to O(1/ε_trim); the cost is a
    * looser rank guarantee — the trimmed digest answers within
    * 2·(ε_build + ε_trim)·N (the build/merge error plus the
    * compression's ≤ ε_trim·N, kept conservative), spec-pinned on
    * ~1,000-input deep-merge roots. Count stays exact. The image's
    * recorded ε becomes ε_trim so later merges budget correctly. */
  def quantile_digest_trim(c: Column, targetEps: Double): Column =
    toColumn(QuantileDigestTrim(toExpression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(targetEps)))
}

/** Build: doubles in, compressed GK image out. */
case class QuantileDigestAgg(child: Expression, relativeError: Double,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries]
    with UnaryLike[Expression] {

  require(relativeError > 0 && relativeError < 1,
    "relativeError must be in (0, 1)")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_digest_agg requires a double column, got ${other.sql}")
  }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      relativeError)

  override def update(buf: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double]) else buf
  }

  override def merge(b1: QuantileSummaries,
                     b2: QuantileSummaries): QuantileSummaries = {
    // GK merge requires flushed heads on both sides
    val l = b1.compress(); val r = b2.compress()
    if (r.count == 0) l else if (l.count == 0) r else l.merge(r)
  }

  override def eval(buf: QuantileSummaries): Any =
    QuantileDigest.serialize(buf)

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantileDigest.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileDigestAgg =
    copy(child = c)
}

/** Re-merge: digest images in, digest image out. The empty-group
  * identity is a zero-count summary, absorbed on first real merge. */
case class QuantileDigestMerge(child: Expression,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_digest_merge_agg requires a binary digest, got ${other.sql}")
  }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError)

  override def update(buf: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val other = QuantileDigest.deserialize(v.asInstanceOf[Array[Byte]])
      if (other.count == 0) buf
      else if (buf.count == 0) other
      else buf.compress().merge(other)
    }
  }

  override def merge(b1: QuantileSummaries,
                     b2: QuantileSummaries): QuantileSummaries = {
    val l = b1.compress(); val r = b2.compress()
    if (r.count == 0) l else if (l.count == 0) r else l.merge(r)
  }

  override def eval(buf: QuantileSummaries): Any =
    QuantileDigest.serialize(buf)

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantileDigest.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileDigestMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileDigestMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): QuantileDigestMerge =
    copy(child = c)
}

/** Scalar: quantile at fraction q from a digest image. Eval-only
  * (CodegenFallback) — it runs over segment-sized digest frames, never
  * in a raw-row hot path. */
case class QuantileDigestQuery(left: Expression, right: Expression)
    extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantile_digest_query requires (binary, double), got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val bytes = left.eval(input)
    val q = right.eval(input)
    if (bytes == null || q == null) null
    else {
      val qs = QuantileDigest.deserialize(bytes.asInstanceOf[Array[Byte]])
      qs.query(q.asInstanceOf[Double]) match {
        case Some(v) => v
        case None => null
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileDigestQuery =
    copy(left = newLeft, right = newRight)
}

/** Scalar: re-compress a digest image at a coarser ε (see
  * [[QuantileDigest.quantile_digest_trim]]). Eval-only — runs over
  * segment-sized digest frames. */
case class QuantileDigestTrim(left: Expression, right: Expression)
    extends Expression with BinaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantile_digest_trim requires (binary, double), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val bytes = left.eval(input)
    val e = right.eval(input)
    if (bytes == null || e == null) null
    else {
      val eps = e.asInstanceOf[Double]
      require(eps > 0 && eps < 1, "trim eps must be in (0, 1)")
      val qs = QuantileDigest.deserialize(bytes.asInstanceOf[Array[Byte]])
      // a trim TIGHTER than the build ε would record an ε the digest
      // cannot honor (the true rank error stays ≥ ε_build), silently
      // understating the max(ε) budget of every later merge
      require(eps >= qs.relativeError,
        s"trim eps ($eps) must be coarser than the image's recorded " +
          s"eps (${qs.relativeError}) — a digest cannot tighten its " +
          "error after the fact")
      // rebuilding with relativeError = eps makes compress() use the
      // 2·eps·count merge threshold AND records eps in the image, so
      // later merges take max(ε) over the loosest participant
      val loose = new QuantileSummaries(qs.compressThreshold, eps,
        qs.sampled, qs.count, true)
      QuantileDigest.serialize(loose.compress())
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileDigestTrim =
    copy(left = newLeft, right = newRight)
}

/** Scalar: the exact row count carried by a digest image. */
case class QuantileDigestCount(child: Expression)
    extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_digest_count requires binary, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input)
    if (bytes == null) null
    else QuantileDigest.deserialize(bytes.asInstanceOf[Array[Byte]]).count
  }

  override protected def withNewChildInternal(
      c: Expression): QuantileDigestCount = copy(child = c)
}

/** Scalar: the relative error recorded in a digest image. */
case class QuantileDigestEps(child: Expression)
    extends Expression with UnaryLike[Expression] with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantile_digest_eps requires binary, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input)
    if (bytes == null) null
    else QuantileDigest.deserialize(bytes.asInstanceOf[Array[Byte]])
      .relativeError
  }

  override protected def withNewChildInternal(
      c: Expression): QuantileDigestEps = copy(child = c)
}
