package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ContentSummary, FileStatus, Path,
  RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A local FileSystem registered under the `cfs:` scheme that records
  * metadata/write operations per path — the measurement harness for
  * the versioned store's FS-op budget
  * ([[streaming.IndexMaintenanceStream.VersionedStore]]): on HDFS/S3A
  * the LISTING is the expensive primitive, so the spec counts
  * `listStatus` calls against the store root per applied batch, and
  * `create` calls prove a delete-only batch never starts a delta
  * write job at all. */
class CountingFs extends RawLocalFileSystem {
  override def getScheme: String = "cfs"
  override def getUri: URI = CountingFs.NAME
  override def listStatus(p: Path): Array[FileStatus] = {
    CountingFs.record("listStatus", p)
    super.listStatus(p)
  }
  override def getContentSummary(p: Path): ContentSummary = {
    CountingFs.record("getContentSummary", p)
    super.getContentSummary(p)
  }
  override def create(p: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    CountingFs.record("create", p)
    super.create(p, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
}

/** The `AbstractFileSystem` twin (FileContext resolves through this —
  * the pointer swap's atomic rename rides FileContext). */
class CountingAbstractFs(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new CountingFs(), conf, "cfs", false)

object CountingFs {
  val NAME: URI = URI.create("cfs:///")
  private val ops =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  def record(op: String, p: Path): Unit = {
    ops.add((op, p.toUri.getPath)); ()
  }
  def reset(): Unit = ops.clear()
  def snapshot: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    ops.asScala.toSeq
  }
  /** Register the scheme on a session's Hadoop conf (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.cfs.impl", classOf[CountingFs].getName)
    hc.set("fs.AbstractFileSystem.cfs.impl",
      classOf[CountingAbstractFs].getName)
  }
}
