package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** 2-D Morton (Z-order) code: bit-interleave of the LOW 16 BITS of two
  * long dimensions — `a` on even bit positions, `b` on odd — yielding a
  * 32-bit space-filling-curve key in a long.
  *
  * Rows close on the Z-curve are close in BOTH dimensions, so sorting a
  * table by this code co-clusters it for min/max pruning on either
  * dimension — the data-layout optimization (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`) that at 100 TB decides whether a two-sided selective scan
  * reads 0.1% or 100% of the files. Callers feed either raw keys (masked
  * here) or quantile bucket ids ([[QuantileBucket]]) for skewed data.
  *
  * Pure arithmetic (5 shift/mask rounds per dimension, the standard
  * magic-number spread), fully inlined by [[doGenCode]] — no virtual
  * call, stays inside whole-stage codegen.
  */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_code requires (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonCode.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ga, gb) = (ctx.freshName("ga"), ctx.freshName("gb"))
      def spread(v: String): String =
        s"""$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""long $ga = $a & 0xFFFFL;
         |long $gb = $b & 0xFFFFL;
         |${spread(ga)}
         |${spread(gb)}
         |${ev.value} = $ga | ($gb << 1);""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonCode {
  /** Interpreter twin of the generated code (shared by tests). */
  def interleave(a: Long, b: Long): Long =
    spread(a & 0xFFFFL) | (spread(b & 0xFFFFL) << 1)

  private def spread(v0: Long): Long = {
    var v = (v0 | (v0 << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    (v | (v << 1)) & 0x55555555L
  }

  /** 3-D interleave, 21 bits per dimension → 63-bit code. Static and
    * allocation-free so generated code calls it directly. */
  def interleave3(a: Long, b: Long, c: Long): Long =
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)

  private def spread3(v0: Long): Long = {
    // standard 21-bit→63-bit magic spread (each bit followed by 2 zeros)
    var v = v0 & 0x1FFFFFL
    v = (v | (v << 32)) & 0x001F00000000FFFFL
    v = (v | (v << 16)) & 0x001F0000FF0000FFL
    v = (v | (v << 8)) & 0x100F00F00F00F00FL
    v = (v | (v << 4)) & 0x10C30C30C30C30C3L
    (v | (v << 2)) & 0x1249249249249249L
  }

  /** 4-D interleave, 16 bits per dimension → 64-bit code. */
  def interleave4(a: Long, b: Long, c: Long, d: Long): Long =
    spread4(a) | (spread4(b) << 1) | (spread4(c) << 2) | (spread4(d) << 3)

  private def spread4(v0: Long): Long = {
    // 16-bit→61-bit spread (each bit followed by 3 zeros)
    var v = v0 & 0xFFFFL
    v = (v | (v << 24)) & 0x000000FF000000FFL
    v = (v | (v << 12)) & 0x000F000F000F000FL
    v = (v | (v << 6)) & 0x0303030303030303L
    (v | (v << 3)) & 0x1111111111111111L
  }
}

/** 3-D Morton code, 21 bits per dimension → 63-bit key — `OPTIMIZE
  * ZORDER BY (a, b, c)`. Codegen is one static call to the
  * allocation-free [[MortonCode.interleave3]]. */
case class MortonCode3(first: Expression, second: Expression,
                       third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_code requires bigint dimensions, got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    MortonCode.interleave3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.MortonCode.interleave3($a, $b, $c);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** 4-D Morton code, 16 bits per dimension → 64-bit key. */
case class MortonCode4(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_code requires bigint dimensions, got " +
        children.map(_.dataType.sql).mkString("(", ", ", ")"))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    MortonCode.interleave4(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.MortonCode.interleave4($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression,
      d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Bucket index (0 .. boundaries.size) of a double value in a sorted
  * boundary array — the quantile-normalization step in front of
  * [[MortonCode]] for skewed dimensions. Binary search per row over a
  * plan-constant array; codegen'd via a reference object like
  * [[PathUnderSet]].
  *
  * NaN maps to bucket 0 (a layout key must be total; clustering the
  * unknowns together is exactly what min/max pruning wants). The
  * operator layer maps NULL dimensions through `coalesce(…, NaN)` for
  * the same reason.
  */
case class QuantileBucket(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket requires double, got ${child.dataType.sql}")
  override def dataType: DataType = LongType

  @transient private lazy val sorted: Array[Double] = boundaries.toArray

  def bucketOf(v: Double): Long = {
    if (v.isNaN) return 0L
    val i = java.util.Arrays.binarySearch(sorted, v)
    (if (i >= 0) i + 1 else -i - 1).toLong
  }

  override def nullSafeEval(v: Any): Any = bucketOf(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantileBucket", this,
      classOf[QuantileBucket].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bucketOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
