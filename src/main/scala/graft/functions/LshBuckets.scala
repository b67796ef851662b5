package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Banded random-hyperplane LSH buckets for an embedding: `bands` bucket
  * ids, band `b` built from `planes` sign bits
  * (`bucket_b = b·2^planes + Σ_i [proj_{b·planes+i} > 0]·2^i`).
  *
  * All arithmetic is INTEGER and order-independent, so the bucket ids are
  * exactly reproducible in plain SQL (the DuckDB oracle mirrors them with
  * `unnest + generate_subscripts` and the same LCG formula):
  *   - components are quantized: `vq_j = ⌊e_j · 2^20⌋` (exact for float
  *     inputs — 2^20 scaling is a power of two);
  *   - plane `p`'s pseudo-random coefficient for 1-based dimension `j` is
  *     `comp(p,j) = (md5("p,j")[0:15 hex] mod 2^31) − 2^30` — an md5
  *     avalanche per (plane, dim) pair, computed ONCE per executor (the
  *     cache below), never per row. A C-rand-style LCG over `p·k + j` was
  *     tried first and is a trap: within a plane it makes the coefficient
  *     vector an ARITHMETIC PROGRESSION in `j` (constant step mod 2^31),
  *     so projections correlate across planes and bucket occupancy blows
  *     up ~65× at 1M vectors (12k-vector buckets → a 4G-row self-join);
  *   - `proj_p = Σ_j vq_j · comp(p,j)`, sign → bit.
  * Overflow bound: |vq|·|comp|·dim ≤ 2^21·2^30·2^12 = 2^63 — safe for
  * |e_j| < 2 up to 4096 dims.
  *
  * Replaces the `aggregate(zip_with(…))` formulation, which was a
  * CodegenFallback higher-order function (interpreted per element); here
  * the loop is one compiled method call per row inside whole-stage codegen.
  *
  * Banding trades candidate recall against bucket size exactly like
  * MinHash-LSH banding: a pair is a candidate if ANY band matches. Scale
  * `planes` with corpus size (buckets per band = 2^planes bounds the
  * within-bucket self-join) and `bands` with target recall.
  */
case class LshBuckets(child: Expression, planes: Int, bands: Int)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 62 && bands >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<float|double>, got ${other.sql}")
  }

  // comp(p, j) cache, built once per executor on first row (dim-sized)
  @transient private var compCache: Array[Array[Long]] = _

  private def comps(dim: Int): Array[Array[Long]] = {
    if (compCache == null || compCache(0).length != dim) {
      val md = java.security.MessageDigest.getInstance("MD5")
      compCache = Array.tabulate(bands * planes, dim) { (p, j0) =>
        val hex = md.digest(s"$p,${j0 + 1}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        java.lang.Long.parseLong(hex, 16) % 2147483648L - 1073741824L
      }
    }
    compCache
  }

  /** Shared by eval and codegen. */
  def buckets(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val f = isFloat
    val comp = comps(n)
    val vq = new Array[Long](n)
    var j = 0
    while (j < n) {
      val v = if (f) a.getFloat(j).toDouble else a.getDouble(j)
      vq(j) = math.floor(v * 1048576.0).toLong
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong << planes
      var i = 0
      while (i < planes) {
        val cp = comp(b * planes + i)
        var proj = 0L
        var k = 0
        while (k < n) { proj += vq(k) * cp(k); k += 1 }
        if (proj > 0) acc |= (1L << i)
        i += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = buckets(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBuckets", this, classOf[LshBuckets].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.buckets($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {
  def lsh_buckets(e: Column, planes: Int, bands: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(LshBuckets(toExpression(e), planes, bands))
  }
}
