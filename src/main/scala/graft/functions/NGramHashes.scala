package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable 60-bit hash of the word `n`-gram at EVERY position of a token
  * array, in position order (NOT distinct) — byte-for-byte the long the
  * composable formulation
  * `transform(sequence(1, size-(n-1)), p ->
  *   cast(conv(substring(md5(concat_ws(' ', slice(toks, p, n))), 1, 15),
  *        16, 10) as bigint))`
  * produces, which is what the DuckDB oracles mirror (md5-hex-parse — the
  * engine-portable hash family of SCALING.md).
  *
  * The composable form is an interpreted higher-order function building a
  * gram STRING, hex-rendering an md5, substring-ing and radix-parsing it
  * per position — the hot inner loop of duplicated-span localization and
  * winnowing. Here it is one compiled method per row inside whole-stage
  * codegen: md5 over the gram bytes, first 15 hex chars == big-endian
  * first 8 digest bytes >>> 4, no hex string ever materialized.
  *
  * Positions with fewer than `n` tokens left contribute nothing; an input
  * shorter than `n` tokens yields an empty array (callers filter those
  * rows — the reference formulation's `sequence(1, m-n+1)` is undefined
  * there).
  */
case class NGramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes requires array<string>, got ${other.sql}")
  }

  /** Shared by eval and codegen. */
  def hashAll(a: ArrayData): ArrayData = {
    val m = a.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = a.getUTF8String(i); i += 1 }
    val sep = NGramHashes.Sep
    val md = NGramHashes.digest()
    val out = new Array[Long](m - n + 1)
    val gram = new Array[UTF8String](n)
    var s = 0
    while (s <= m - n) {
      var j = 0
      while (j < n) { gram(j) = toks(s + j); j += 1 }
      val d = md.digest(UTF8String.concatWs(sep, gram: _*).getBytes)
      // first 15 hex chars of the digest == big-endian first 8 bytes >>> 4
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(s) = hi >>> 4
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = hashAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramHashes", this,
      classOf[NGramHashes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.hashAll($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramHashes {
  private val Sep = UTF8String.fromString(" ")

  // MessageDigest is stateful; `digest()` resets it after each use, so one
  // instance per task thread is safe and skips per-gram allocation.
  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private def digest(): MessageDigest = local.get()

  def ngram_hashes(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(NGramHashes(toExpression(tokens), n))
  }
}
