package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev instrumentation harness (NOT part of the driver contract): per
  * query, count Spark jobs, stages and tasks alongside wall time — the
  * optimization guide's "measure first" step for action-count-dominated
  * fixtures (a lifecycle query's wall time is mostly #jobs × per-job
  * overhead at bench scale, not data volume).
  *
  * Usage: `runMain graft.JobCount <sfDir> <queryName> [queryName ...]`
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // experiment knob: JOBCOUNT_CONF="k=v;k=v" extra session configs
    sys.env.get("JOBCOUNT_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    val verbose = sys.env.get("JOBCOUNT_VERBOSE").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val site = j.stageInfos.lastOption.map(_.details.linesIterator
            .filterNot(_.contains("org.apache.spark"))
            .filterNot(_.contains("java.")).take(2).mkString(" <- "))
            .getOrElse("?")
          val name = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          println(s"JOB ${j.jobId} [$name] $site")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
      private val execStart =
        new java.util.concurrent.ConcurrentHashMap[Long, (Long, String)]()
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case s: SparkListenerSQLExecutionStart =>
          execStart.put(s.executionId, (s.time, s.description))
        case s: SparkListenerSQLExecutionEnd if verbose =>
          Option(execStart.remove(s.executionId)).foreach {
            case (t0, desc) =>
              val head = desc.linesIterator.toSeq.headOption.getOrElse("")
              println(f"EXEC ${s.executionId}%d ${(s.time - t0) / 1000.0}%6.3fs $head")
          }
        case _ =>
      }
    })
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    args.drop(1).foreach { name =>
      // warm run first so codegen/scan caches don't skew the counted run
      SparkEntry.queries(name)(spark, sfDir).count()
      Thread.sleep(200) // let async listener events drain
      jobs.set(0); stages.set(0); tasks.set(0L)
      val t = secs(SparkEntry.queries(name)(spark, sfDir).count())
      Thread.sleep(500)
      println(f"JOBCOUNT $name%s wall=$t%.2f jobs=${jobs.get}%d " +
        f"stages=${stages.get}%d tasks=${tasks.get}%d")
    }
    spark.stop()
  }
}
