package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve index of (a, b) on the 2^16 × 2^16 grid — the
  * alternative layout key to [[MortonCode]] with strictly better
  * locality: consecutive curve positions are always GRID-ADJACENT
  * (|Δx|+|Δy| = 1), where the Z-curve takes a long diagonal jump every
  * power-of-two boundary. In file terms: a range of Hilbert keys maps to
  * one compact rectangle-ish region, so per-file min/max boxes are
  * tighter and selective two-dimensional scans skip more files. The
  * price is a loop (16 rotate/reflect rounds) instead of Morton's
  * straight-line masks — still branch-light integer work, emitted as
  * one static call by codegen.
  *
  * Classic iterative xy→d algorithm (rotate/reflect per bit plane).
  */
case class HilbertCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_code requires (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCode.index16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertCode.index16($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertCode {

  /** Hilbert index on the 2^order grid (inputs masked to `order` bits). */
  def index(order: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation lines up
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The 16-bit instance the expression uses (32-bit key — the same
    * resolution as 2-D [[MortonCode]]). Static and allocation-free for
    * direct calls from generated code. */
  def index16(x: Long, y: Long): Long = index(16, x, y)
}
