package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.inodes.InodeView

/** The derived-column library — the Spark equivalent of the reference's
  * per-INode accessor lambdas (`AbstractQueryEngine.java:155-197,206-281,
  * 290-379`, `VersionContext.java:113-219`). Every engine field is a pure
  * `Column` expression (whole-stage-codegen friendly; no UDFs), so Catalyst
  * can fold, prune, and push down around them.
  *
  * Time-relative fields take `now` explicitly — the reference reads the wall
  * clock per element (`AbstractQueryEngine.java:722-740`); an explicit clock
  * keeps queries deterministic and cache-reusable.
  */
object Fields {

  /** Long-typed fields (`Constants.java FILTER_LONG` + sum fields). */
  def longField(name: String, now: Long = InodeView.NowMs): Column = name match {
    case "id"          => col("id")
    case "fileSize"    => col("fileSize")
    case "blockSize"   => col("blockSize")
    case "numBlocks"   => col("numBlocks")
    case "fileReplica" => col("fileReplica")
    case "numReplicas" => col("numBlocks") * col("fileReplica")
    case "diskspaceConsumed" => col("fileSize") * col("fileReplica")
    // NameNode heap estimate: 150 bytes per inode + 150 per block
    // (`AbstractQueryEngine.java:173-180,417-426`).
    case "memoryConsumed" =>
      when(col("isFile"), lit(150L) + lit(150L) * col("numBlocks")).otherwise(150L)
    case "accessTime" => col("accessTime")
    case "modTime"    => col("modTime")
    case "depth"      => col("depth")
    case "permission" => col("permission")
    case "storageType" => col("storagePolicyId")
    case "dirNumChildren" => col("dirNumChildren")
    case "nsQuota"     => col("nsQuota")
    case "dsQuota"     => col("dsQuota")
    case "nsQuotaUsed" => col("nsQuotaUsed")
    case "dsQuotaUsed" => col("dsQuotaUsed")
    // used/assigned*100 truncated to long (`AbstractQueryEngine.java:427-442`);
    // floor == truncate for the non-negative domain.
    case "nsQuotaRatioUsed" =>
      when(col("nsQuota") > 0,
        floor(col("nsQuotaUsed") * lit(100.0) / col("nsQuota"))).otherwise(0L)
    case "dsQuotaRatioUsed" =>
      when(col("dsQuota") > 0,
        floor(col("dsQuotaUsed") * lit(100.0) / col("dsQuota"))).otherwise(0L)
    case "count" => lit(1L) // summing `count` == COUNT(*)
    // join-backed fields — present after PathStructure.enrich
    case "dirSubTreeSize" | "dirSubTreeNumFiles" | "dirSubTreeNumDirs" => col(name)
    case other => throw new IllegalArgumentException(s"unknown long field: $other")
  }

  /** String-typed fields (`Constants.java FILTER_STRING` + histogram keys). */
  def stringField(name: String, now: Long = InodeView.NowMs): Column = name match {
    case "name"  => col("name")
    case "path"  => col("path")
    case "user"  => col("user")
    case "group" => col("group")
    // MM/dd/yyyy render of epoch-ms (`AbstractQueryEngine.java:232-251,300-319`)
    case "modDate"    => dateString(col("modTime"))
    case "accessDate" => dateString(col("accessTime"))
    case "fileType"   => FileTypes.classify(col("name"))
    case "storageType" =>
      InodeView.StoragePolicies.foldLeft(lit("NO_MAPPING")) { case (acc, (id, nm)) =>
        when(col("storagePolicyId") === id, lit(nm)).otherwise(acc)
      }
    case other => throw new IllegalArgumentException(s"unknown string field: $other")
  }

  /** Boolean fields (`Constants.java FILTER_BOOLEAN`). The quota-ancestry
    * flags need the [[PathStructure.enrich]] join first. */
  def booleanField(name: String): Column = name match {
    case "isUnderConstruction" => col("isUnderConstruction")
    case "isWithSnapshot"      => col("isWithSnapshot")
    case "hasAcl"              => col("hasAcl")
    case "hasQuota"            => col("hasQuota")
    case "hasEcPolicy"         => col("hasEcPolicy")
    case "isUnderNsQuota" | "isUnderDsQuota" => col(name)
    case other => throw new IllegalArgumentException(s"unknown boolean field: $other")
  }

  def dateString(epochMs: Column): Column =
    date_format(timestamp_millis(epochMs), "MM/dd/yyyy")

  def isLong(name: String): Boolean = QueryChecker.FilterLong(name)
  def isString(name: String): Boolean = QueryChecker.FilterString(name)
  def isBoolean(name: String): Boolean = QueryChecker.FilterBoolean(name)
}
