package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Feature-hashed bag-of-words embedding (Weinberger et al. 2009) as ONE
  * compiled pass per row — byte-for-byte the doubles the composable
  * formulation in `TextAnalysis.hashedEmbedding` produces:
  *
  * {{{
  *   h_t    = portableHash(token) % P           // P = 2³¹−1
  *   emb[j] = (Σ_t ((h_t·A_j + B_j) mod P − (P−1)/2)) / P
  *   A_j    = ((j+1)·2654435761) mod P,  B_j = ((j+1)·40503) mod P
  * }}}
  *
  * The composable form is `transform(sequence(0, dims−1), j ->
  * aggregate(hashes, …))` — an interpreted nested higher-order function
  * that re-walks the token array once per dimension, boxing every element
  * and hex-rendering an md5 per token per walk. That made the model-free
  * embedding featurizer the slowest query in the bench (7.5 s at sf0.1 —
  * and `cosineNearDupPairs` evaluates its input expression three times:
  * bucket explode + both pair join-backs). Here: md5 once per token
  * (first 8 digest bytes >>> 4, no hex string), then `dims` fused
  * multiply-adds on longs, inside whole-stage codegen.
  *
  * NULL array elements contribute nothing (skipped, like `concat_ws`) —
  * `split` never produces them, but the function is registered in SQL
  * where any `array<string>` can reach it.
  */
case class HashedEmbedding(child: Expression, dims: Int)
    extends UnaryExpression {

  require(dims >= 1, "dims must be >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_embedding requires array<string>, got ${other.sql}")
  }

  // affine permutation coefficients, fixed per dimension
  @transient private lazy val coefA: Array[Long] =
    Array.tabulate(dims)(j => (j + 1) * 2654435761L % HashedEmbedding.P)
  @transient private lazy val coefB: Array[Long] =
    Array.tabulate(dims)(j => (j + 1) * 40503L % HashedEmbedding.P)

  /** Shared by eval and codegen. */
  def embed(a: ArrayData): ArrayData = {
    val p = HashedEmbedding.P
    val center = (p - 1L) / 2L
    val m = a.numElements()
    val acc = new Array[Long](dims)
    val md = HashedEmbedding.digest()
    var i = 0
    while (i < m) {
      val s = a.getUTF8String(i)
      if (s != null) {
        val d = md.digest(s.getBytes)
        val hi =
          ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        val h = (hi >>> 4) % p
        var j = 0
        while (j < dims) {
          acc(j) += (h * coefA(j) + coefB(j)) % p - center
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Double](dims)
    var j = 0
    while (j < dims) { out(j) = acc(j).toDouble / p; j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = embed(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedEmbedding", this,
      classOf[HashedEmbedding].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.embed($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedEmbedding {
  /** Mersenne prime 2³¹−1 — the shared universal-hash modulus
    * (`Dedup.HashP`). */
  val P: Long = 2147483647L

  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private def digest(): MessageDigest = local.get()

  def hashed_embedding(tokens: Column, dims: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(HashedEmbedding(toExpression(tokens), dims))
  }
}
