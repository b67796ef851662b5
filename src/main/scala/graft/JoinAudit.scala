package graft
// one-off: report join strategies of the pipeline self-joins under
// checkpointed (stats-less) inputs — the hazard class found in near-dup
import org.apache.spark.sql.functions._
object JoinAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.range(50000).select(col("id").as("doc_id"),
      expr("""array_join(transform(sequence(0, 39), j ->
        concat('w', pmod(xxhash64(id * 40 + j), 3000))), ' ')""").as("text"))
      .localCheckpoint(true)
    def joins(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val kinds = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin").map(k => k -> (p.split(k).length - 1))
        .filter(_._2 > 0)
      println(s"JOINAUDIT $name: ${kinds.map{case(k,n)=>s"$k x$n"}.mkString(", ")}")
    }
    joins("jaccardPairs", graft.pipeline.Dedup.jaccardPairs(docs, "doc_id", col("text"), 3, 600000L))
    joins("minhashCandidates", graft.pipeline.Dedup.minhashCandidates(docs, "doc_id", col("text")))
    joins("simhashPairs", graft.pipeline.Dedup.simhashPairs(docs, "doc_id", col("text")))
    val emb = spark.range(50000).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 15), j ->
        cast(pmod(xxhash64(id, j), 2000) as float) / 1000.0 - 1.0)""")
        .cast("array<float>").as("embedding")).localCheckpoint(true)
    joins("lshTopK", graft.pipeline.Similarity.lshTopK(emb.where(col("vec_id") < 5), emb, 5, 12, 4))
    joins("cosineNearDupPairs", graft.pipeline.Similarity.cosineNearDupPairs(emb, 900000L, 14, 4))
    joins("decontaminate", graft.pipeline.Curation.decontaminate(docs, docs.limit(100), "doc_id", col("text"), 5))
    spark.stop()
  }
}
