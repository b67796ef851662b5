package graft
import org.apache.spark.sql.functions._

/** Throwaway dev probe (not part of the library surface). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val d = "/root/testdata/sf0.1"
    def secs(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.core.Tables.documents(spark, d)
    secs("docs.count")(docs.count())
    val k = 5
    val ghArr = s"""transform(sequence(1, size(__toks) - $k + 1),
        p -> cast(conv(substring(md5(concat_ws(' ', slice(__toks, p, $k))),
                       1, 15), 16, 10) as bigint))"""
    val base = docs
      .select(col("doc_id").as("did"),
        graft.pipeline.TextAnalysis.tokens(col("text")).as("__toks"))
      .where(size(col("__toks")) >= k)
      .select(col("did"),
        (size(col("__toks")) - (k - 1)).cast("long").as("n_grams"),
        expr(ghArr).as("__gh"))
    secs("base.count")(base.count())
    val ex0 = base
      .select(col("did"), col("n_grams"),
        posexplode(col("__gh")).as(Seq("__p0", "gh")))
      .select(col("did"), col("n_grams"), (col("__p0") + 1).as("p"), col("gh"))
    secs("ex0.count")(ex0.count())
    secs("checkpoint")(graft.pipeline.Dedup.checkpointCorpus(ex0))
    val ex = graft.pipeline.Dedup.checkpointCorpus(ex0)
    secs("dupGrams+semi")(
      ex.join(ex.groupBy(col("gh")).agg(count(lit(1)).as("__c"))
          .where(col("__c") > 1).hint("shuffle_hash"), Seq("gh"), "left_semi")
        .count())
    secs("full_query")(SparkEntry.queries("dedup_dup_spans")(spark, d).count())
    secs("full_query_again")(SparkEntry.queries("dedup_dup_spans")(spark, d).count())
    spark.stop()
  }
}
