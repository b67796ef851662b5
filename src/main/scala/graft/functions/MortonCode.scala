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
