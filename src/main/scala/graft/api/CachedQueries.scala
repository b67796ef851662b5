package graft.api

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Row}
import scala.jdk.CollectionConverters._

/** User-registered cached queries (§2.10): the reference lets users register
  * any `/filter` or `/histogram` query string for re-execution on every
  * suggestions cycle (`SuggestionsEngine.setQueryToAnalysis/
  * performCustomQueries/getLatestCacheQueryResult`, ~`:744-1010`).
  *
  * Here a cached query is an [[NNAQuery]] registered by name; [[refresh]]
  * re-runs the whole registry against a snapshot (one job per query, all
  * over the same cached relation), and the latest collected results are
  * served without touching the cluster — mirroring the reference's
  * MapDB-backed result cache (S10).
  */
object CachedQueries {

  /** Driver-side result rows are capped: histograms/sums are tiny, but a
    * registered path dump with no limit would otherwise collect an
    * unbounded namespace listing into the driver heap. Dumps past the cap
    * must go through the path-dump sink (S6) instead. */
  val MaxCachedRows: Int = 100000

  private val registry = new ConcurrentHashMap[String, NNAQuery]()
  private val results = new ConcurrentHashMap[String, (Long, Array[Row], Seq[String])]()

  def register(name: String, query: NNAQuery): Unit = registry.put(name, query)

  def remove(name: String): Unit = { registry.remove(name); results.remove(name) }

  def list: Seq[String] = registry.keySet().asScala.toSeq.sorted

  /** Re-execute every registered query against the snapshot (one cycle).
    * A query whose result exceeds [[MaxCachedRows]] (or errors) is SKIPPED —
    * its previous result stays served, its failure is recorded — and the
    * cycle continues, so one bad registration can't leave every later query
    * permanently stale. Returns the failures of this cycle by query name. */
  def refresh(inodes: DataFrame, nowMs: Long): Map[String, Throwable] = {
    val failures = Map.newBuilder[String, Throwable]
    registry.asScala.foreach { case (name, q) =>
      try {
        val df = NNAQuery.execute(q.copy(now = nowMs), inodes)
        val rows = df.limit(MaxCachedRows + 1).collect()
        if (rows.length > MaxCachedRows)
          throw new IllegalStateException(
            s"cached query '$name' returned > $MaxCachedRows rows; " +
            "register it with a limit or use the path-dump sink")
        results.put(name, (nowMs, rows, df.columns.toSeq))
      } catch {
        case e: Exception => failures += name -> e
      }
    }
    failures.result()
  }

  /** Latest cached result with its cycle timestamp (None if never run). */
  def latest(name: String): Option[(Long, Array[Row], Seq[String])] =
    Option(results.get(name))

  def clear(): Unit = { registry.clear(); results.clear() }
}
