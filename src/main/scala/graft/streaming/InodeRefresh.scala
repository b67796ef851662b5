package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Namespace freshness — the S4 analog of the reference's edit-log tailing
  * (`NameNodeLoader.java:382-390`): keep the inode snapshot current by
  * applying a stream of inode mutations.
  *
  * A mutation batch is rows of the inode schema plus `op` ('upsert' |
  * 'delete') and a monotonically increasing `seq`. [[applyBatch]] is a
  * latest-wins merge by id — one shuffle on id, the standard CDC-upsert
  * shape (a Delta/Iceberg MERGE would replace this on a lakehouse table).
  * [[stream]] wires it into Structured Streaming via foreachBatch,
  * republishing the merged snapshot each micro-batch.
  */
object InodeRefresh {

  /** Latest-wins merge: mutations override current rows with the same id;
    * 'delete' tombstones drop the row. */
  def applyBatch(current: DataFrame, mutations: DataFrame): DataFrame = {
    val cols = current.columns.filter(c => c != "op" && c != "seq")
    val base = current.select(cols.map(col).toSeq: _*)
      .withColumn("op", lit("upsert")).withColumn("seq", lit(Long.MinValue))
    val all = base.unionByName(mutations.select((cols.map(col) :+ col("op") :+ col("seq")).toSeq: _*))
    val w = Window.partitionBy(col("id")).orderBy(col("seq").desc)
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("op") =!= "delete")
      .select(cols.map(col).toSeq: _*)
  }

  /** Tail a directory of mutation parquet files, maintaining a published
    * snapshot via `publish` on every micro-batch. Returns the query handle. */
  def stream(spark: SparkSession, initial: DataFrame, mutationsDir: String,
             publish: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(
      initial.schema.fields :+
        org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType) :+
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType))
    var current = initial
    spark.readStream.schema(schema).parquet(mutationsDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        current = applyBatch(current, batch).localCheckpoint(eager = true)
        publish(current)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
