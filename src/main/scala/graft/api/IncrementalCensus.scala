package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental suggestions census — the 100 TB cadence win.
  *
  * The reference re-analyzes the ENTIRE namespace every 15 minutes
  * (`nna.suggestions.reload.sleep.ms=900000`); at 300M+ files that full
  * pass is the cycle's whole budget. But every FILE metric in
  * [[Suggestions]] is a linear conditional aggregate (a count or a
  * conditional sum), so for a namespace step S → S′:
  *
  *   census(S′) = census(S) + census(addedRows) − census(removedRows)
  *
  * with a modified inode contributing its new row to `added` and its old
  * row to `removed`. A cycle then costs O(|delta| + |dirs|) instead of
  * O(|namespace|): file metrics fold over the edit-touched rows only,
  * and the five DIR metrics — which are NOT row-linear (emptyDirs flips
  * when an untouched parent gains a child; quota ratios aggregate whole
  * subtrees) — recompute from the dirs-only scan, typically 1–3% of the
  * namespace.
  *
  * Age predicates (`oldFiles1yr`, `…24h`) compare against a FIXED epoch,
  * so incremental cycles carry the last full census's `asOfMs` forward:
  * an untouched file silently crossing an age boundary between cycles
  * would otherwise make the fold drift. Rebase (full recompute with a
  * fresh `now`) on the reference's own slower cadence — e.g. daily — and
  * fold the 15-minute deltas in between.
  */
object IncrementalCensus {

  /** The 21 linear file metrics, in [[Suggestions]] column order. */
  private[graft] def fileMetricNames(prev: DataFrame): Seq[String] =
    prev.columns.toSeq.takeWhile(_ != "numDirs")

  /** census(S′) from the previous census plus the delta row sets.
    *
    * @param prev      previous 1-row census ([[Suggestions.cachedValues]]
    *                  or a previous fold), file + dir columns
    * @param removed   full inode rows leaving the namespace (old versions
    *                  of modified rows included)
    * @param added     full inode rows entering it (new versions included)
    * @param dirsAfter the POST-step namespace (any frame whose non-file
    *                  rows are S′'s dirs — S′ itself is fine; only its
    *                  `!isFile` slice is scanned)
    * @param asOfMs    the LAST FULL census's epoch — pinned, see class doc
    */
  def fold(prev: DataFrame, removed: DataFrame, added: DataFrame,
           dirsAfter: DataFrame, asOfMs: Long): DataFrame = {
    val fileCols = fileMetricNames(prev)
    require(fileCols.nonEmpty && fileCols.head == "numFiles",
      s"prev census lacks the file-metric prefix: ${prev.columns.toSeq}")
    val p = Suggestions.fileValues(added, asOfMs)
      .select(fileCols.map(c => col(c).as(s"p_$c")): _*)
    val m = Suggestions.fileValues(removed, asOfMs)
      .select(fileCols.map(c => col(c).as(s"m_$c")): _*)
    val folded = fileCols.map { c =>
      // sums over an EMPTY delta frame are null — fold as zero
      (coalesce(col(c), lit(0L)) + coalesce(col(s"p_$c"), lit(0L)) -
        coalesce(col(s"m_$c"), lit(0L))).as(c)
    }
    prev.select(fileCols.map(col): _*)
      .crossJoin(p).crossJoin(m)
      .select(folded: _*)
      .crossJoin(Suggestions.dirValues(dirsAfter))
  }

  /** Per-user twin of [[fold]]: the user maps are the SAME linear file
    * metrics grouped by user, so they fold per key. The combine is a
    * full-outer join over three user-bounded frames (previous map,
    * added-census, removed-census) — |users| rows, not |files|. Users
    * whose last file left the delta fold to zero and are dropped,
    * matching what a full recompute would produce. */
  def foldUserMaps(prevMaps: DataFrame, removed: DataFrame,
                   added: DataFrame, asOfMs: Long): DataFrame = {
    val metricCols = prevMaps.columns.toSeq.filterNot(_ == "user")
    val p = Suggestions.cachedUserMaps(added, asOfMs)
      .select(col("user") +: metricCols.map(c => col(c).as(s"p_$c")): _*)
    val m = Suggestions.cachedUserMaps(removed, asOfMs)
      .select(col("user") +: metricCols.map(c => col(c).as(s"m_$c")): _*)
    prevMaps
      .join(p, Seq("user"), "full_outer")
      .join(m, Seq("user"), "full_outer")
      .select(col("user") +: metricCols.map { c =>
        (coalesce(col(c), lit(0L)) + coalesce(col(s"p_$c"), lit(0L)) -
          coalesce(col(s"m_$c"), lit(0L))).as(c)
      }: _*)
      .where(col("numFiles") > 0)
  }

  /** Scan predicate covering every row an edit-log ops frame can touch:
    * exact paths of creations/patches/closes (and concat sources), plus
    * whole subtrees of renames (BOTH roots) and deletes. Ops frames are
    * control-plane-bounded, so the path lists collect driver-side and
    * compile into one pushdown-friendly predicate; `removed` is then
    * `S.where(pred)` and `added` is `S′.where(pred)` — each an
    * ops-bounded slice of one metadata scan, never a join. */
  def touchedPredicate(ops: DataFrame): Column = {
    val rows = ops.select(col("opcode"), col("path"),
      col("dst"), col("srcs")).collect()
    val exact = scala.collection.mutable.Set[String]()
    val prefixes = scala.collection.mutable.Set[String]()
    rows.foreach { r =>
      val opcode = r.getString(0)
      val path = r.getString(1)
      opcode match {
        case "OP_RENAME" | "OP_RENAME_OLD" =>
          prefixes += path
          Option(r.getString(2)).foreach(prefixes += _)
        case "OP_DELETE" =>
          prefixes += path
        case "OP_CONCAT_DELETE" =>
          exact += path
          Option(r.getSeq[String](3)).foreach(_.foreach(exact += _))
        case _ =>
          if (path != null) exact += path
      }
    }
    val exactPred =
      if (exact.isEmpty) lit(false)
      else col("path").isin(exact.toSeq: _*)
    prefixes.toSeq.sorted.foldLeft(exactPred) { (acc, p) =>
      acc || col("path") === p || col("path").startsWith(p + "/")
    }
  }
}
