package graft
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** A/B: signature aggregation with compiled vs composable shingle hashes.
  * The final agg SUMS all 64 mins so nothing prunes away. */
object MhProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val words = expr(
      """transform(sequence(0, 39), j ->
           concat('w', pmod(xxhash64(id * 40 + j) % (1 + pmod(xxhash64(id, j), 3000)), 3000)))""")
    val docs = spark.range(n)
      .select(col("id").as("doc_id"), array_join(words, " ").as("text"))
      .localCheckpoint(true)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"MHPROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    def sigSum(h0p: org.apache.spark.sql.DataFrame): Long = {
      val mins = (0 until 64).map(k => min(Dedup.permute(col("h0p"), k)).as(s"m$k"))
      h0p.groupBy("doc_id").agg(mins.head, mins.tail: _*)
        .select(expr((0 until 64).map(k => s"m$k").mkString("+")).as("s"))
        .agg(sum("s")).head().getLong(0)
    }
    for (round <- 1 to 2) {
      t(s"hashes_only_compiled_r$round") {
        docs.select(explode(Dedup.shingleHashes(col("text"), 3)).as("h"))
          .agg(sum(col("h").cast("decimal(38,0)"))).head().get(0)
      }
      t(s"hashes_only_composable_r$round") {
        docs.select(explode(Dedup.shingles(col("text"), 3)).as("s"))
          .select(Dedup.portableHash(col("s")).as("h"))
          .agg(sum(col("h").cast("decimal(38,0)"))).head().get(0)
      }
      t(s"sig_compiled_r$round") {
        sigSum(docs.select(col("doc_id"),
            explode(Dedup.shingleHashes(col("text"), 3)).as("h60"))
          .select(col("doc_id"), (col("h60") % Dedup.HashP).as("h0p")))
      }
      t(s"sig_composable_r$round") {
        sigSum(docs.select(col("doc_id"),
            explode(Dedup.shingles(col("text"), 3)).as("s"))
          .select(col("doc_id"), (Dedup.portableHash(col("s")) % Dedup.HashP).as("h0p")))
      }
    }
    spark.stop()
  }
}
