package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder: split a dim-`d` embedding into `m`
  * contiguous subvectors and emit, per subspace, the index of the nearest
  * codebook entry by squared-L2 distance — the corpus-compression primitive
  * of PQ/IVFPQ similarity search (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011).
  *
  * The codebooks (`m × ksub × d/m` doubles — index-build scale, e.g.
  * 16×256×96 ≈ 3 MB for a 1536-dim corpus) are embedded in the expression
  * and ship to executors with the serialized plan, so encoding is ONE
  * projection over the corpus scan: no crossJoin against a codebook table,
  * no per-subspace window, no Exchange between the scan and the codes.
  * A 64-dim float vector (256 bytes) compresses to `m` codes (8 bytes at
  * m=8/ksub≤256) — a 32× storage cut, which is what makes billion-vector
  * serving fit in memory.
  *
  * Distances accumulate left-to-right in doubles (`d += (x−c)·(x−c)`), and
  * ties prefer the LOWER code index (strict `<` compare), so DuckDB can
  * mirror the assignment bit-for-bit with a sequential `list_reduce` fold
  * and `ROW_NUMBER … ORDER BY dist ASC, code ASC` for the oracle.
  */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_codes requires at least one non-empty codebook")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<float|double>, got ${other.sql}")
  }

  /** Shared by eval and codegen (generated code calls back into this
    * compiled method — the argmin loops run as JIT'd JVM code and the
    * expression stays inside whole-stage codegen). */
  def encode(a: ArrayData): ArrayData = {
    val f = isFloat
    val n = a.numElements()
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    // fail LOUDLY on short vectors: silently skipping missing components
    // would hand a corrupt/truncated embedding plausible-looking codes —
    // at 100 TB a dimension mismatch is a data bug worth surfacing
    if (n < m * subDim)
      throw new IllegalArgumentException(
        s"pq_codes: embedding has $n components, codebooks need ${m * subDim}")
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * subDim
      var best = 0L
      var bestDist = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val e = cb(c)
        var dist = 0.0
        var i = 0
        while (i < subDim) {
          val xv = if (f) a.getFloat(off + i).toDouble else a.getDouble(off + i)
          val d = xv - e(i)
          dist += d * d
          i += 1
        }
        // strict compare: equal distances keep the earlier (lower) code
        if (dist < bestDist) { bestDist = dist; best = c.toLong }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this, classOf[PqCodes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodes {
  /** PQ codes (0-based, one per subspace) for each embedding in `e`.
    * `codebooks(s)(c)` is subspace `s`'s entry `c` (dim/m doubles). */
  def pq_codes(e: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(PqCodes(toExpression(e), codebooks))
  }
}
