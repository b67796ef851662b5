package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Strict-parity translator for the reference's SQL dialect: the analog of
  * `sql/INodeSqlStatementVisitor.java:88-299`, re-expressed over Spark's own
  * parser. Where the reference walks a JSQLParser AST, we walk the Catalyst
  * UNRESOLVED logical plan from `sessionState.sqlParser.parsePlan` — the
  * Spark-native equivalent of a visitor, with no extra parser dependency —
  * and translate to the engine's native vocabulary (`field:op:value`
  * filters, histogram type, sum/find, limit, sort).
  *
  * Dialect rules reproduced:
  *   - AND-only WHERE: an `Or` anywhere throws at parse level (`:111-113`);
  *   - BETWEEN lowers to `gte` + `lte` (date/timestamp literals to epoch
  *     ms, bounds normalized low→high, equal bounds to `eq`; `:116-146`);
  *   - LIKE maps by %-position: none→`eq`, both-ends→`contains`,
  *     leading→`endsWith`, else→`startsWith` (`:149-174`);
  *   - comparison ops map to eq/notEq/gt/gte/lt/lte (`:177-237`);
  *   - first GROUP BY expression is the histogram type, the aggregate item
  *     maps COUNT→count, SUM→sum field, MIN/MAX/AVG→find (`:239-283`);
  *   - ORDER BY direction → sortAscending/Descending, LIMIT n (`:284-297`).
  */
object SqlDialect {

  /** The reference `SqlParser`'s output fields (`SqlParser.java:36-46`). */
  case class Parsed(
      set: String,
      filters: Seq[String] = Nil,
      histType: Option[String] = None,
      sum: Option[String] = None,
      find: Option[String] = None,
      limit: Option[Int] = None,
      sortAscending: Option[Boolean] = None)

  def parse(spark: SparkSession, sql: String): Parsed = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    var p = Parsed(set = "")
    def visit(node: LogicalPlan): Unit = node match {
      case GlobalLimit(IntegerLiteral(n), child) =>
        p = p.copy(limit = Some(n)); visit(child)
      case LocalLimit(_, child) => visit(child)
      case Sort(order, _, child, _) =>
        order.headOption.foreach { o =>
          p = p.copy(sortAscending = Some(o.direction == Ascending))
        }
        visit(child)
      case Aggregate(grouping, aggregates, child, _) =>
        grouping.headOption.foreach {
          case a: UnresolvedAttribute => p = p.copy(histType = Some(a.name))
          case other => throw unsupported(s"GROUP BY expression: $other")
        }
        // reference: with GROUP BY the aggregate is select item 1, else 0
        val aggItem = if (grouping.nonEmpty && aggregates.length > 1)
          aggregates(1) else aggregates.head
        visitAggregate(aggItem)
        visit(child)
      case Project(items, child) =>
        items.foreach(visitAggregate)
        visit(child)
      case Filter(condition, child) =>
        visitPredicate(condition); visit(child)
      case r: UnresolvedRelation =>
        p = p.copy(set = r.multipartIdentifier.last.toLowerCase)
      case SubqueryAlias(_, child) => visit(child)
      case other => throw unsupported(s"clause: ${other.nodeName}")
    }

    def visitAggregate(item: Expression): Unit = item match {
      case UnresolvedAlias(child, _) => visitAggregate(child)
      case Alias(child, _) => visitAggregate(child)
      case f: UnresolvedFunction =>
        val fn = f.nameParts.last.toLowerCase
        val arg = f.arguments.headOption.map {
          case a: UnresolvedAttribute => a.name
          case _: UnresolvedStar | _: Literal => "count"
          case other => throw unsupported(s"aggregate argument: $other")
        }.getOrElse("count")
        fn match {
          case "count" => p = p.copy(sum = Some("count"))
          case "sum" => p = p.copy(sum = Some(arg))
          case "min" | "max" | "avg" => p = p.copy(find = Some(s"$fn:$arg"))
          case other => throw unsupported(s"aggregate function: $other")
        }
      case _: UnresolvedAttribute => () // the grouped key re-selected
      case _: UnresolvedStar => ()     // SELECT * (path dump)
      case other => throw unsupported(s"select item: $other")
    }

    def visitPredicate(e: Expression): Unit = e match {
      case And(l, r) => visitPredicate(l); visitPredicate(r)
      case _: Or =>
        // reference `INodeSqlStatementVisitor.java:111-113`
        throw unsupported("OR (the dialect is an AND-chain)")
      case EqualTo(a, v) => addFilter(a, "eq", v)
      case Not(EqualTo(a, v)) => addFilter(a, "notEq", v)
      case GreaterThan(a, v) => addFilter(a, "gt", v)
      case GreaterThanOrEqual(a, v) => addFilter(a, "gte", v)
      case LessThan(a, v) => addFilter(a, "lt", v)
      case LessThanOrEqual(a, v) => addFilter(a, "lte", v)
      case f: UnresolvedFunction if f.nameParts.last.equalsIgnoreCase("between") =>
        // reference `:116-146`: bounds normalized low→high (swapped when
        // reversed), equal bounds collapse to a single eq
        val Seq(attr, lo, hi) = f.arguments
        val field = attr match {
          case a: UnresolvedAttribute => a.name
          case other => throw unsupported(s"BETWEEN field: $other")
        }
        val (l, h) = (renderValue(lo), renderValue(hi))
        val (lv, hv) =
          try { val (a, b) = (BigDecimal(l), BigDecimal(h))
            if (a > b) (h, l) else (l, h) }
          catch { case _: NumberFormatException =>
            if (l > h) (h, l) else (l, h) }
        p = p.copy(filters = p.filters ++ (
          if (lv == hv) Seq(s"$field:eq:$lv")
          else Seq(s"$field:gte:$lv", s"$field:lte:$hv")))
      case Like(a, Literal(s, _), _) =>
        val value = String.valueOf(s)
        val first = value.indexOf('%'); val last = value.lastIndexOf('%')
        val op =
          if (first == -1) "eq"
          else if (first == 0 && last == value.length - 1 && value.length > 1) "contains"
          else if (first == 0) "endsWith"
          else "startsWith"
        addFilter(a, op, Literal(value.replace("%", "")))
      case other => throw unsupported(s"predicate: ${other.sql}")
    }

    def renderValue(value: Expression): String = value match {
      // date/timestamp literals lower to epoch ms, like the reference's
      // DateValue/TimestampValue handling in BETWEEN (`:129-137`)
      case Literal(days: Int, DateType) => (days.toLong * 86400000L).toString
      case Literal(micros: Long, TimestampType) => (micros / 1000L).toString
      case Literal(v, _) => String.valueOf(v)
      case other => throw unsupported(s"filter value: $other")
    }

    def addFilter(attr: Expression, op: String, value: Expression): Unit = {
      val field = attr match {
        case a: UnresolvedAttribute => a.name
        case other => throw unsupported(s"filter field: $other")
      }
      p = p.copy(filters = p.filters :+ s"$field:$op:${renderValue(value)}")
    }

    visit(plan)
    p
  }

  /** Lower a parsed statement onto the native query surface. */
  def toQuery(p: Parsed, parentDirDepth: Int, timeRange: String,
              now: Long): graft.api.NNAQuery = {
    val find = p.find.map { f =>
      val Array(op, field) = f.split(':'); (op, field)
    }
    graft.api.NNAQuery(
      set = p.set,
      filters = p.filters.mkString(","),
      sum = p.sum.filter(_ != "count").toSeq ++
        (if (p.sum.contains("count") && p.histType.isEmpty) Seq("count") else Nil),
      find = find,
      histType = p.histType,
      timeRange = timeRange,
      parentDirDepth = parentDirDepth,
      // histogram + LIMIT maps to top/bottom-k by sort direction
      top = p.histType.flatMap(_ =>
        if (p.sortAscending.contains(true)) None else p.limit),
      bottom = p.histType.flatMap(_ =>
        if (p.sortAscending.contains(true)) p.limit else None),
      sortAscending = p.sortAscending,
      limit = if (p.histType.isEmpty) p.limit else None,
      now = now)
  }

  private def unsupported(what: String) =
    new UnsupportedOperationException(s"not in the reference dialect: $what")
}
