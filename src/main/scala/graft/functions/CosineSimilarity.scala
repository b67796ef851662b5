package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two numeric arrays (`array<float>` or
  * `array<double>`).
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), …)` — is a
  * higher-order function, which Catalyst evaluates as CodegenFallback
  * (interpreted lambda per element). This expression generates a tight
  * primitive loop via `doGenCode`, accumulating dot/|a|²/|b|² in one pass —
  * the plan stays inside whole-stage codegen, no per-element allocation.
  *
  * Accumulation order matches the HOF formulation (left-to-right in double),
  * so results are bit-identical with the DuckDB `list_cosine_similarity`
  * oracle.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity requires two arrays of float or double of the " +
        s"same element type, got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  // Null is also produced for malformed input (length mismatch, null
  // elements, zero-norm vector) — a silent plausible-looking number would
  // mask data bugs at scale; the DuckDB oracle raises on these instead.
  override def nullable: Boolean = true

  private def elementsMayBeNull: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val isFloat = elemType(left).contains(FloatType)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (isFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemType(left).contains(FloatType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      // the per-element null branch is emitted only when the schema says
      // elements can be null — hot path stays a straight primitive loop
      val nullCheck = if (elementsMayBeNull)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $xv = (double) $a.$getter($i);
         |    double $yv = (double) $b.$getter($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  if (${ev.isNull} || $nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level entry point (plus SQL registration hook). Spark 4 routes
    * Column↔Expression through the (private[sql]) classic converters —
    * bridged via [[org.apache.spark.sql.GraftColumnBridge]]. */
  def cosine_similarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(CosineSimilarity(toExpression(a), toExpression(b)))
  }

  /** Register `cosine_similarity` for Spark SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
}
