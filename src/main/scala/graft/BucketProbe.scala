package graft
import org.apache.spark.sql.functions._
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val emb = spark.range(n)
      .select(col("id").as("vec_id"), expr(
        """transform(sequence(0, 63), j ->
             cast(pmod(xxhash64(id, j), 2000) as float) / 1000.0 - 1.0)""")
        .cast("array<float>").as("embedding"))
    val v = emb.select(explode(graft.functions.LshBuckets.lsh_buckets(
      col("embedding"), 18, 4)).as("bucket"))
    val occ = v.groupBy("bucket").count()
    occ.agg(count(lit(1)).as("n_buckets"), max("count").as("max_occ"),
        expr("approx_percentile(count, array(0.5, 0.99, 0.999))").as("pcts"),
        sum(col("count") * col("count")).as("sum_sq"))
      .show(false)
    occ.orderBy(col("count").desc).show(10, false)
    spark.stop()
  }
}
