package graft.engine

/** Fail-fast query validation — the ported set-validity matrix of the
  * reference (`Constants.java:364-484`, enforced by
  * `analytics/QueryChecker.java:79-250`). Pure Scala; rejects illegal
  * field/op/set combinations before any Spark plan is built.
  */
object QueryChecker {

  val FilterLong: Set[String] = Set(
    "id", "accessTime", "modTime", "fileSize", "diskspaceConsumed",
    "memoryConsumed", "fileReplica", "blockSize", "numBlocks", "numReplicas",
    "dirNumChildren", "dirSubTreeSize", "dirSubTreeNumFiles",
    "dirSubTreeNumDirs", "storageType", "depth", "permission")

  val FilterString: Set[String] = Set(
    "name", "path", "user", "group", "modDate", "accessDate")

  val FilterBoolean: Set[String] = Set(
    "isUnderConstruction", "isWithSnapshot", "hasAcl", "hasQuota",
    "hasEcPolicy", "isUnderNsQuota", "isUnderDsQuota")

  val FilterFile: Set[String] = Set(
    "id", "blockSize", "fileSize", "fileReplica", "diskspaceConsumed",
    "numBlocks", "numReplicas", "isUnderConstruction", "storageType",
    "accessTime", "modTime", "memoryConsumed", "depth", "permission",
    "name", "path", "user", "group", "modDate", "accessDate",
    "isWithSnapshot", "hasAcl", "hasQuota", "isUnderNsQuota",
    "isUnderDsQuota", "hasEcPolicy")

  val FilterDir: Set[String] = Set(
    "id", "dirNumChildren", "dirSubTreeSize", "dirSubTreeNumFiles",
    "dirSubTreeNumDirs", "accessDate", "accessTime", "modDate", "modTime",
    "memoryConsumed", "depth", "permission", "name", "path", "user", "group",
    "isWithSnapshot", "hasAcl", "hasQuota", "storageType", "isUnderNsQuota",
    "isUnderDsQuota", "hasEcPolicy")

  val FilterAll: Set[String] = FilterFile intersect FilterDir

  val TypeFile: Set[String] = Set(
    "fileSize", "fileReplica", "diskspaceConsumed", "storageType", "user",
    "accessTime", "modTime", "memoryConsumed", "parentDir", "group", "fileType")

  val TypeDir: Set[String] = Set(
    "user", "accessTime", "modTime", "memoryConsumed", "parentDir", "group",
    "storageType", "dirQuota")

  val TypeAll: Set[String] = TypeFile intersect TypeDir

  val SumFile: Set[String] = Set(
    "fileSize", "diskspaceConsumed", "blockSize", "numBlocks", "numReplicas",
    "memoryConsumed", "count")

  val SumDir: Set[String] = Set(
    "count", "dirNumChildren", "memoryConsumed", "nsQuota", "dsQuota",
    "nsQuotaUsed", "dsQuotaUsed", "nsQuotaRatioUsed", "dsQuotaRatioUsed")

  val SumAll: Set[String] = SumFile intersect SumDir

  val FindFile: Set[String] = Set(
    "accessTime", "modTime", "blockSize", "diskspaceConsumed", "fileSize",
    "memoryConsumed")

  val FindDir: Set[String] = Set("accessTime", "modTime", "memoryConsumed")

  val FindAll: Set[String] = FindFile intersect FindDir

  val LongOps: Set[String] = Set("eq", "notEq", "lt", "lte", "gt", "gte",
    "minutesAgo", "hoursAgo", "daysAgo", "monthsAgo", "yearsAgo",
    "olderThanMinutes", "olderThanHours", "olderThanDays", "olderThanMonths",
    "olderThanYears")
  val StringOps: Set[String] = Set("eq", "notEq", "startsWith",
    "notStartsWith", "endsWith", "notEndsWith", "contains", "notContains")
  val DateOps: Set[String] = Set("dateEq", "dateNotEq", "dateLt", "dateLte",
    "dateStart", "dateGt", "dateGte", "dateEnd")
  val BooleanOps: Set[String] = Set("eq", "notEq")

  def filterSet(set: String): Set[String] = set match {
    case "files" => FilterFile
    case "dirs"  => FilterDir
    case "all"   => FilterAll
    case other   => throw bad(s"unknown set: $other")
  }

  def typeSet(set: String): Set[String] = set match {
    case "files" => TypeFile; case "dirs" => TypeDir; case "all" => TypeAll
    case other => throw bad(s"unknown set: $other")
  }

  def sumSet(set: String): Set[String] = set match {
    case "files" => SumFile; case "dirs" => SumDir; case "all" => SumAll
    case other => throw bad(s"unknown set: $other")
  }

  def findSet(set: String): Set[String] = set match {
    case "files" => FindFile; case "dirs" => FindDir; case "all" => FindAll
    case other => throw bad(s"unknown set: $other")
  }

  /** Validate one `field:op:value` filter triplet against a set. */
  def checkFilter(set: String, field: String, op: String): Unit = {
    if (!filterSet(set)(field)) throw bad(s"filter $field not valid for set $set")
    val opOk =
      (FilterLong(field) && LongOps(op)) ||
      (FilterString(field) && (if (field == "modDate" || field == "accessDate") DateOps(op) else StringOps(op))) ||
      (FilterBoolean(field) && BooleanOps(op))
    if (!opOk) throw bad(s"op $op not valid for filter $field")
  }

  def checkType(set: String, histType: String): Unit =
    if (!typeSet(set)(histType)) throw bad(s"histogram type $histType not valid for set $set")

  def checkSum(set: String, sum: String): Unit =
    if (!sumSet(set)(sum)) throw bad(s"sum $sum not valid for set $set")

  def checkFind(set: String, findField: String): Unit =
    if (!findSet(set)(findField)) throw bad(s"find field $findField not valid for set $set")

  private def bad(msg: String) = new IllegalArgumentException(msg)
}
