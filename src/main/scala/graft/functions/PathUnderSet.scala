package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TRUE iff any PROPER ancestor directory of `path` (excluding root and
  * the path itself — reference `AbstractQueryEngine.java:356-366`) is in a
  * small sorted dictionary of directory paths.
  *
  * This is the zero-shuffle form of the quota-ancestry semi-join: when the
  * broadcast gate proves the quota-dir set small (≤ ~100k paths ≈ a few
  * MB), membership is a per-row binary search over the sorted set — one
  * codegen'd projection over the snapshot, no ancestor explode, no
  * exchange, no join. Cost per row: O(depth · log |dirs|) string
  * comparisons (HDFS depth ~≤20). Past the gate the caller falls back to
  * the set-at-a-time explode + shuffle join, which scales to any
  * dictionary size.
  *
  * `dirs` is a Seq for structural equality (plan canonicalization); the
  * sorted search array is built lazily once per executor.
  */
case class PathUnderSet(child: Expression, dirs: Seq[String])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"path_under_set requires string, got ${other.sql}")
  }

  @transient private lazy val sorted: Array[String] = {
    val a = dirs.toArray
    java.util.Arrays.sort(a.asInstanceOf[Array[AnyRef]])
    a
  }

  /** Shared by eval and codegen. */
  def hasAncestorIn(s: UTF8String): Boolean = {
    val path = s.toString
    var slash = path.indexOf('/', 1)
    while (slash > 0) {
      if (java.util.Arrays.binarySearch(
          sorted.asInstanceOf[Array[AnyRef]], path.substring(0, slash)) >= 0)
        return true
      slash = path.indexOf('/', slash + 1)
    }
    false
  }

  override def nullSafeEval(s: Any): Any =
    hasAncestorIn(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pathUnderSet", this, classOf[PathUnderSet].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.hasAncestorIn($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PathUnderSet {
  def path_under_set(path: Column, dirs: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(PathUnderSet(toExpression(path), dirs))
  }
}
