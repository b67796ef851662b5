package graft.api

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Write-back operations (SURVEY §2.9): delete / setReplication /
  * setStoragePolicy over a filtered inode set.
  *
  * Deliberately driver-side and rate-limited — matching the reference's
  * semantics (`operations/BaseOperation.java:35-166`): ordered iteration,
  * a throttle sleep between ops (default 5000 ms, `Constants.java:30`,
  * sleeps < 100 ms skipped), per-op logging, abortability by UUID. The
  * actual filesystem mutation is a stub exactly like the reference
  * (`Delete.java:45-64`, `SetReplication.java:55`, `SetStoragePolicy.java:56`
  * are TODO stubs there too); [[Operation.applyFn]] is the injection point
  * for a real Hadoop FileSystem client.
  *
  * Paths stream from the executors via `toLocalIterator` — the filtered set
  * is never collected whole, so a million-path delete holds one partition
  * in driver memory at a time.
  */
object Operations {

  sealed trait Kind { def name: String }
  case object Delete extends Kind { val name = "delete" }
  case class SetReplication(replica: Short) extends Kind { val name = "setReplication" }
  case class SetStoragePolicy(policy: String) extends Kind { val name = "setStoragePolicy" }

  final case class Operation(
      id: String, kind: Kind, query: String, totalPaths: Long,
      applyFn: String => Boolean) {
    private[api] val aborted = new AtomicBoolean(false)
    @volatile private[api] var performed: Long = 0
    @volatile private[api] var lastPath: String = ""
    def abort(): Unit = aborted.set(true)
    def progress: (Long, Long, String) = (performed, totalPaths, lastPath)
  }

  private val running = new ConcurrentHashMap[String, Operation]()

  def listOperations: Seq[(String, String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    running.values().asScala.toSeq.map(o =>
      (o.id, o.kind.name, o.performed, o.totalPaths))
  }

  def abortOperation(id: String): Boolean =
    Option(running.get(id)).exists { o => o.abort(); true }

  /** Submit an operation over the `path` column of a filtered set.
    * `sleepMs` throttles between ops; sleeps < 100 ms are skipped
    * (reference parity). Runs synchronously; wrap in a Future for the
    * reference's async submit semantics. */
  def run(filtered: DataFrame, kind: Kind, query: String = "",
          sleepMs: Long = 5000L,
          applyFn: String => Boolean = stubApply): Operation = {
    val paths = filtered.select(col("path")).orderBy(col("path"))
    val total = paths.count()
    val op = Operation(UUID.randomUUID().toString, kind, query, total, applyFn)
    running.put(op.id, op)
    try {
      val it = paths.toLocalIterator()
      while (it.hasNext && !op.aborted.get()) {
        val p = it.next().getString(0)
        applyFn(p)
        op.performed += 1
        op.lastPath = p
        if (sleepMs >= 100 && it.hasNext) Thread.sleep(sleepMs)
      }
      op
    } finally running.remove(op.id)
  }

  /** STUB mutation — logs and reports success, like the reference's TODO
    * bodies. Replace with a Hadoop FileSystem call in production. */
  def stubApply(path: String): Boolean = true
}
