package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("streamed windowed counts equal the batch equivalent") {
    val streamed = EventsStream.runToMemory(spark,
      EventsStream.windowedCounts(EventsStream.readStream(spark, dir)),
      "win_counts", org.apache.spark.sql.streaming.OutputMode.Append)
    // append mode only emits windows below the watermark; compare those
    val batch = graft.core.Tables.events(spark, dir)
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val streamedMap = streamed.select("window.start", "event_type", "n")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val batchMap = batch.select("window.start", "event_type", "n")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(streamedMap.nonEmpty)
    streamedMap.foreach { case (k, v) => assert(batchMap(k) === v, s"window $k") }
  }

  test("inode refresh: latest-wins merge with tombstones") {
    import org.apache.spark.sql.functions._
    val ino = graft.inodes.InodeView.inodes(spark, dir).limit(10)
    val first = ino.orderBy("id").limit(1)
    val muts = first.withColumn("user", lit("changed"))
      .withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
      .unionByName(
        ino.orderBy(col("id").desc).limit(1)
          .withColumn("op", lit("delete")).withColumn("seq", lit(2L)))
    val merged = graft.streaming.InodeRefresh.applyBatch(ino, muts)
    assert(merged.count() === 9) // one tombstoned
    val changedId = first.head().getAs[Long]("id")
    assert(merged.where(col("id") === changedId).head()
      .getAs[String]("user") === "changed")
  }

  test("inode refresh: streamed mutations republish the snapshot") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("muts").toString
    val ino = graft.inodes.InodeView.inodes(spark, dir).limit(20)
      .localCheckpoint(true)
    // write one mutation batch: delete the 5 largest ids
    ino.orderBy(col("id").desc).limit(5)
      .withColumn("op", lit("delete")).withColumn("seq", lit(1L))
      .write.parquet(tmp + "/batch1")
    var published: Option[Long] = None
    val q = graft.streaming.InodeRefresh.stream(spark, ino, tmp + "/batch1",
      snap => published = Some(snap.count()))
    q.awaitTermination()
    assert(published.contains(15L))
  }

  test("sessionization splits on idle gaps") {
    val events = EventsStream.readStream(spark, dir)
    val sessions = EventsStream.runToMemory(spark,
      EventsStream.sessionize(spark, events), "sessions")
    // closed sessions only (open ones stay in state); sanity: all positive
    // lengths, end >= start, per-user ordered
    val rows = sessions.collect()
    assert(rows.forall(r => r.getAs[Long]("end") >= r.getAs[Long]("start")))
    assert(rows.forall(r => r.getAs[Long]("n") >= 1))
  }
}
