package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence counts of tokens against `markerSets` — ALL sets in one pass
  * over the token array, returned as `array<long>` in set order.
  *
  * The composable form (`size(filter(toks, t => array_contains(lit(...),
  * t)))`, once per language) is an interpreted higher-order function
  * evaluated per set per row — the hottest expression of the text family
  * (language-ID scores four sets per document). Here each token does
  * `|sets|` hash-set membership probes inside one compiled loop. */
case class MarkerHits(child: Expression, markerSets: Array[Array[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"marker_hits requires array<string>, got ${other.sql}")
  }

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markerSets.map { ws =>
      val s = new java.util.HashSet[UTF8String](ws.length * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }

  /** Shared by eval and codegen. */
  def hits(a: ArrayData): ArrayData = {
    val ss = sets
    val counts = new Array[Long](ss.length)
    val m = a.numElements()
    var i = 0
    while (i < m) {
      val t = a.getUTF8String(i)
      var k = 0
      while (k < ss.length) {
        if (ss(k).contains(t)) counts(k) += 1
        k += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(a: Any): Any = hits(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerHits", this, classOf[MarkerHits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.hits($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerHits {
  def marker_hits(tokens: Column, markerSets: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(MarkerHits(toExpression(tokens),
      markerSets.map(_.toArray).toArray))
  }
}
