package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `topN` nearest centroids (by cosine) of an embedding, as an array of
  * centroid ids ordered best-first — the IVF cell-assignment / cell-probe
  * primitive.
  *
  * The centroid matrix is embedded in the expression (broadcast to executors
  * with the serialized plan — `nlist × dim` doubles, e.g. 4096×1536 ≈ 50 MB
  * worst case, index-build scale), so assignment is ONE projection over the
  * corpus scan: no crossJoin row blow-up, no window, **no Exchange** between
  * the scan and the cell id. The previous formulation
  * (crossJoin(centroids) → row_number window → rank 1) shuffled N×nlist
  * rows to compute a per-row argmax.
  *
  * Per-centroid similarity reproduces [[CosineSimilarity]] bit-for-bit
  * (same left-to-right double accumulation, same `dot/(√nx·√nc)` form with
  * centroid norms pre-accumulated in index order), and ties prefer the
  * lower centroid id (centroids are sorted by id) — so results are
  * bit-identical to the old window formulation ordered by
  * (sim DESC, cent_id ASC), and DuckDB can mirror the whole assignment
  * with `list_cosine_similarity` + ROW_NUMBER for the oracle.
  */
case class NearestCentroids(child: Expression, centIds: Array[Long],
                            cents: Array[Array[Double]], topN: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<float|double>, got ${other.sql}")
  }

  // centroid norms, accumulated in index order exactly like CosineSimilarity
  @transient private lazy val centNorms: Array[Double] = cents.map { c =>
    var ny = 0.0; var i = 0
    while (i < c.length) { ny += c(i) * c(i); i += 1 }
    math.sqrt(ny)
  }

  /** Shared by eval and codegen (the generated code calls back into this
    * compiled method — the loop runs as JIT'd JVM code and the expression
    * stays inside whole-stage codegen). */
  def nearest(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val f = isFloat
    val topSims = new Array[Double](topN)
    val topIds = new Array[Long](topN)
    var cnt = 0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val m = math.min(n, cv.length)
      var dot = 0.0; var nx = 0.0
      var i = 0
      while (i < m) {
        val xv = if (f) a.getFloat(i).toDouble else a.getDouble(i)
        dot += xv * cv(i); nx += xv * xv
        i += 1
      }
      val sim = dot / (math.sqrt(nx) * centNorms(c))
      // strict compare: equal sims keep the earlier (lower) centroid id first
      var pos = cnt
      while (pos > 0 && sim > topSims(pos - 1)) pos -= 1
      if (pos < topN) {
        var k = math.min(cnt, topN - 1)
        while (k > pos) { topSims(k) = topSims(k - 1); topIds(k) = topIds(k - 1); k -= 1 }
        topSims(pos) = sim; topIds(pos) = centIds(c)
        if (cnt < topN) cnt += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topIds, cnt))
  }

  override def nullSafeEval(a: Any): Any = nearest(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.nearest($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {
  /** `topN` nearest centroid ids for each embedding in `e`, best-first.
    * `cents` must be sorted ascending by id (tiebreak order). */
  def nearest_centroids(e: Column, cents: Seq[(Long, Array[Double])],
                        topN: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    val sorted = cents.sortBy(_._1)
    toColumn(NearestCentroids(toExpression(e),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, topN))
  }
}
