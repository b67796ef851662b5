package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word `n`-gram shingles of a token array, single-space-joined —
  * byte-for-byte the same output as the composable formulation
  * `array_distinct(transform(sequence(1, size-(n-1)), i =>
  * array_join(slice(toks, i, n), " ")))` with the short-text fallback
  * `[array_join(toks, " ")]`, which is what the DuckDB oracles mirror.
  *
  * That formulation is three nested higher-order functions — all
  * CodegenFallback, interpreted per element, and the single hottest
  * expression in the dedup family (the shingle explode feeds Jaccard,
  * MinHash and the two-stage verified pipeline). Here the loop is one
  * compiled method call per row inside whole-stage codegen; first-occurrence
  * order is preserved exactly like `array_distinct`.
  */
case class NGramShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_shingles requires array<string>, got ${other.sql}")
  }

  /** Shared by eval and codegen. */
  def shingle(a: ArrayData): ArrayData = {
    val m = a.numElements()
    if (m < n) {
      val all = new Array[UTF8String](m)
      var i = 0
      while (i < m) { all(i) = a.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](
        UTF8String.concatWs(UTF8String.fromString(" "), all: _*)))
    } else {
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = a.getUTF8String(i); i += 1 }
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val sep = UTF8String.fromString(" ")
      var s = 0
      while (s <= m - n) {
        val gram = new Array[UTF8String](n)
        var j = 0
        while (j < n) { gram(j) = toks(s + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, gram: _*))
        s += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(a: Any): Any = shingle(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramShingles", this,
      classOf[NGramShingles].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.shingle($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramShingles {
  def ngram_shingles(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(NGramShingles(toExpression(tokens), n))
  }
}
