package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._
import graft.inodes.InodeView

/** The engine's top-level query surface — one case class capturing every
  * parameter of the reference's `/filter`, `/histogram`, `/histogram2`,
  * `/histogram3` and `/divide` endpoints
  * (`NamenodeAnalyticsMethods.java:1307-2003`), and [[NNAQuery.execute]]
  * compiling it to a single DataFrame plan.
  *
  * Unlike the reference there is no global query lock
  * (`NNA_QUERY_LOCK`, `:1421`) — snapshot immutability makes concurrent
  * queries safe — and multi-sum runs as ONE aggregation pass instead of a
  * re-scan per sum.
  */
case class NNAQuery(
    set: String = "files",                  // files | dirs | all
    filters: String = "",                   // "field:op:value,…" AND-chain
    sum: Seq[String] = Nil,                 // sum fields (multi-sum ok)
    find: Option[(String, String)] = None,  // (min|max|avg, field)
    histType: Option[String] = None,        // histogram grouping key
    histType2: Option[String] = None,       // second level (histogram2)
    timeRange: String = "weekly",
    parentDirDepth: Int = 0,
    histogramConditions: String = "",       // having: "op:val,…"
    top: Option[Int] = None,
    bottom: Option[Int] = None,
    sortAscending: Option[Boolean] = None,
    transformConditions: String = "",       // what-if (fileReplica only)
    transformReplica: Option[Long] = None,
    limit: Option[Int] = None,              // path-dump limit
    now: Long = InodeView.NowMs)

object NNAQuery {

  /** Reference-endpoint query-string params → [[NNAQuery]]; param names
    * are the reference's (`set filters sum find top bottom sortAscending
    * sortDescending timeRange parentDirDepth histogramConditions
    * transformConditions transformOutputs limit`,
    * `NamenodeAnalyticsMethods.java:1540-1578`). Shared by the HTTP
    * front door ([[WebServer]]) and the CLI. */
  def fromParams(p: Map[String, String]): NNAQuery = NNAQuery(
    set = p.getOrElse("set", "files"),
    filters = p.getOrElse("filters", ""),
    sum = p.get("sum").map(_.split(',').toSeq).getOrElse(Nil),
    find = p.get("find").map { f =>
      f.split(':') match {
        case Array(op, field) => (op, field)
        case _ => throw new IllegalArgumentException(
          s"find must be op:field (min|max|avg:field), got $f")
      }
    },
    timeRange = p.getOrElse("timeRange", "weekly"),
    parentDirDepth = p.get("parentDirDepth").map(_.toInt).getOrElse(0),
    histogramConditions = p.getOrElse("histogramConditions", ""),
    top = p.get("top").map(_.toInt),
    bottom = p.get("bottom").map(_.toInt),
    sortAscending =
      if (p.get("sortAscending").exists(_.toBoolean)) Some(true)
      else if (p.get("sortDescending").exists(_.toBoolean)) Some(false)
      else None,
    transformConditions = p.getOrElse("transformConditions", ""),
    transformReplica = p.get("transformOutputs")
      .map(_.stripPrefix("fileReplica:").toLong),
    limit = p.get("limit").map(_.toInt))

  /** Compile + run a query against an inodes snapshot. Result column
    * conventions: path dumps → `path`; sums → one column per sum field;
    * histograms → `key`[, `key2`], value columns named by sum/find field. */
  def execute(q: NNAQuery, inodes: DataFrame): DataFrame = {
    // join-backed filter fields (quota ancestry, subtree stats) need the
    // relation enriched before the predicate can compile
    val usedJoinFields =
      if (q.filters.isEmpty) Set.empty[String]
      else q.filters.split(',').map(_.split(':')(0)).toSet
        .intersect(PathStructure.joinFields)
    val enriched =
      if (usedJoinFields.isEmpty) inodes
      else PathStructure.enrich(inodes, usedJoinFields)
    val base = InodeView.inodeSet(enriched, q.set)
    val filtered =
      if (q.filters.isEmpty) base
      else base.where(Filters.compileAll(q.filters, q.set, q.now))

    // what-if transform: substitute rewritten accessors into aggregations
    val field: String => Column =
      (q.transformReplica, q.transformConditions) match {
        case (Some(out), cond) if cond.nonEmpty =>
          Transforms.transformedField(cond, q.set, out, q.now)
        case _ => (f: String) => Fields.longField(f, q.now)
      }
    def sumAggFor(s: String): Column =
      if (s == "count") count(lit(1)) else sum(field(s))

    q.histType match {
      case Some(t) =>
        QueryChecker.checkType(q.set, t)
        q.sum.foreach(QueryChecker.checkSum(q.set, _))
        val key = Histograms.keyFor(t, q.timeRange, q.parentDirDepth, q.now)
        val dropNoMapping = t == "parentDir"
        val grouped = q.histType2 match {
          case Some(t2) =>
            QueryChecker.checkType(q.set, t2)
            val key2 = Histograms.keyFor(t2, q.timeRange, q.parentDirDepth, q.now)
            val s = q.sum.headOption.getOrElse("count")
            filtered.groupBy(key.as("key"), key2.as("key2"))
              .agg(sumAggFor(s).as("value"))
          case None =>
            q.find match {
              case Some((op, f)) =>
                QueryChecker.checkFind(q.set, f)
                filtered.groupBy(key.as("key"))
                  .agg(Histograms.findAgg(op, f).as("value"))
              case None =>
                val sums = if (q.sum.isEmpty) Seq("count") else q.sum
                if (sums.length == 1)
                  filtered.groupBy(key.as("key")).agg(sumAggFor(sums.head).as("value"))
                else // multi-sum histogram (/histogram3): one pass
                  filtered.groupBy(key.as("key"))
                    .agg(sumAggFor(sums.head).as(sums.head),
                      sums.tail.map(s => sumAggFor(s).as(s)): _*)
            }
        }
        val noMapped = if (dropNoMapping)
          grouped.where(col("key") =!= "NO_MAPPING") else grouped
        val valueCol = if (q.sum.length > 1) col(q.sum.head) else col("value")
        // multi-sum conditions address columns by index (`idx:op:val`,
        // `AbstractQueryEngine.java:1086-1104`); 1-level form is `op:val`
        val havinged = if (q.histogramConditions.nonEmpty) {
          val pred = q.histogramConditions.split(',').map { c =>
            val parts = c.split(':')
            val (target, cond) =
              if (parts.length == 3)
                (col(q.sum(parts(0).toInt)), s"${parts(1)}:${parts(2)}")
              else (valueCol, c)
            Histograms.havingCondition(cond, target)
          }.reduce(_ && _)
          noMapped.where(pred)
        } else noMapped
        val sliced = (q.top, q.bottom) match {
          case (Some(k), _) => havinged.orderBy(valueCol.desc, col("key").asc).limit(k)
          case (_, Some(k)) => havinged.orderBy(valueCol.asc, col("key").asc).limit(k)
          case _ => havinged
        }
        q.sortAscending match {
          case Some(true)  => sliced.orderBy(valueCol.asc, col("key").asc)
          case Some(false) => sliced.orderBy(valueCol.desc, col("key").asc)
          case None => sliced
        }

      case None =>
        q.find match {
          case Some((op, f)) => // global arg-min/max inode; avg is grouped-only
            require(op == "min" || op == "max",
              s"global find allows only min|max (got $op)") // `AbstractQueryEngine.java:470-498`
            QueryChecker.checkFind(q.set, f)
            val v = Fields.longField(f, q.now)
            val sorted = if (op == "max") filtered.orderBy(v.desc, col("id").asc)
              else filtered.orderBy(v.asc, col("id").asc)
            sorted.limit(1).select(col("path"), v.as("value"))
          case None if q.sum.nonEmpty => // /filter with sum(s)
            q.sum.foreach(QueryChecker.checkSum(q.set, _))
            val aggs = q.sum.map {
              case "count" => count(lit(1)).as("count")
              case s => sum(field(s)).as(s)
            }
            filtered.agg(aggs.head, aggs.tail: _*)
          case None => // path dump
            val dumped = filtered.select(col("path")).orderBy(col("path"))
            q.limit.map(dumped.limit).getOrElse(dumped)
        }
    }
  }

  /** `/divide`: ratio of two queries' single-sum results in ppm. */
  def divide(q1: NNAQuery, q2: NNAQuery, inodes: DataFrame): DataFrame = {
    val a = execute(q1, inodes)
    val b = execute(q2, inodes)
    a.select(col(a.columns.head).cast("double").as("n"))
      .crossJoin(b.select(col(b.columns.head).cast("double").as("d")))
      .select(floor(lit(1000000.0) * col("n") / col("d")).cast("long").as("ratio_ppm"))
  }
}
