package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Filename → file-type classifier, re-expressing the reference's
  * `FileTypeHistogram.determineType` (`queries/FileTypeHistogram.java:100-222`)
  * as pure Catalyst expressions (codegen'd `element_at` over literal maps —
  * no UDF, so the classifier participates in whole-stage codegen).
  *
  * Lookup order matches the reference exactly: exact name → 6-char prefix →
  * 10-char prefix → substring-from-last-'.' → substring-from-last-'_' →
  * UNKNOWN.
  */
object FileTypes {

  val exact: Map[String, String] = Map(
    ".pig_header" -> "PIG_HEADER", ".pig_schema" -> "PIG_SCHEMA",
    "_SUCCESS" -> "_SUCCESS", "_DONE" -> "_DONE",
    "_index" -> "_INDEX", "_masterindex" -> "_MASTERINDEX")

  val prefix: Map[String, String] = Map(
    "part-0" -> "PART", "part_0" -> "PART",
    "part_r" -> "PART_R", "part-r" -> "PART_R",
    "part_m" -> "PART_M", "part-m" -> "PART_M",
    "entitylog-" -> "ENTITY_LOG", "domainlog-" -> "DOMAIN_LOG",
    "summarylog" -> "SUMMARY_LOG")

  val suffix: Map[String, String] = Map(
    "_45454" -> "APP_LOG", ".batch" -> "BATCH", ".txt" -> "TXT",
    ".tsv" -> "TSV", ".bz2" -> "BZ2", ".csv" -> "CSV", ".log" -> "LOG",
    ".avro" -> "AVRO", ".avsc" -> "AVSC", ".snappy" -> "SNAPPY",
    ".parquet" -> "PARQUET", ".gz" -> "GZIP", ".tar" -> "TAR",
    ".json" -> "JSON", ".xml" -> "XML", ".index" -> "INDEX",
    ".todo" -> "TODO", ".html" -> "HTML", ".js" -> "JS", ".orc" -> "ORC",
    ".jar" -> "JAR", ".zip" -> "ZIP", ".gzip" -> "GZIP",
    ".names" -> "NAMES", ".nn" -> "NN", ".gbt" -> "GBT",
    ".tmp" -> "TEMP", ".temp" -> "TEMP", ".lz4" -> "LZ4", ".lzo" -> "LZO",
    ".delta" -> "DELTA", ".snapshot" -> "SNAPSHOT", ".sql" -> "SQL",
    ".dtdone" -> "DTDONE", ".done" -> "DONE", ".jhist" -> "JHIST",
    ".dat" -> "DAT", ".data" -> "DATA", ".yaml" -> "YAML", ".yml" -> "YAML",
    ".split" -> "SPLIT", ".splitmetainfo" -> "SPLITMETAINFO",
    ".mp3" -> "MP3", ".wav" -> "WAV", ".jpg" -> "JPEG", ".jpeg" -> "JPEG",
    ".png" -> "PNG", ".war" -> "WAR", ".py" -> "PYTHON", ".java" -> "JAVA",
    ".class" -> "CLASS", ".lock" -> "LOCK",
    ".pending" -> "PENDING", ".PENDING" -> "PENDING",
    ".success" -> "SUCCESS", ".SUCCESS" -> "SUCCESS",
    ".giveup" -> "GIVEUP", ".GIVEUP" -> "GIVEUP",
    ".inprogress" -> "INPROGRESS", ".INPROGRESS" -> "INPROGRESS")

  // typedlit folds the whole map into ONE MapType literal constant; the
  // map(lit, lit, ...) alternative emits ~2×|map| codegen children per
  // lookup, which made this classifier's one-time compile dominate its
  // runtime (cold 2.0 s vs 0.26 s warm at sf0.1).
  private def litMap(m: Map[String, String]): Column = typedlit(m)

  def classify(name: Column): Column = {
    // try_element_at: null on miss even under ANSI mode (Spark 4 default)
    val exactHit = try_element_at(litMap(exact), name)
    val p6 = try_element_at(litMap(prefix.filter(_._1.length == 6)),
      when(length(name) > 6, substring(name, 1, 6)).otherwise(lit("\u0000")))
    val p10 = try_element_at(litMap(prefix.filter(_._1.length == 10)),
      when(length(name) > 10, substring(name, 1, 10)).otherwise(lit("\u0000")))
    // substring from the last '.' (inclusive); sentinel when absent
    val dotExt = when(name.contains("."), concat(lit("."), substring_index(name, ".", -1)))
      .otherwise(lit("\u0000"))
    val underExt = when(name.contains("_"), concat(lit("_"), substring_index(name, "_", -1)))
      .otherwise(lit("\u0000"))
    val sufMap = litMap(suffix)
    coalesce(exactHit, p6, p10,
      try_element_at(sufMap, dotExt), try_element_at(sufMap, underExt), lit("UNKNOWN"))
  }
}
