package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.Maintenance

/** Streaming maintenance of a GENERATION-versioned serving index — the
  * lifecycle twin of the reference's edit-log tailing
  * (`EditLogSource`): a mutation feed (`op` ∈ add | delete | update)
  * drives one [[Maintenance.tick]] per micro-batch against a persisted
  * store, so the BM25 / IVF / signature indexes stay live-updated the
  * way the reference's namespace does, with the same gen-door
  * semantics the batch path proves (gen-aware delete guard, update
  * retry guard, re-add demotion, stats fold, compaction trigger).
  *
  * Persistence layout under `dir` (all through the Hadoop FS layer so
  * it may live on HDFS/S3A like the data):
  *
  *   dir/store/base_boot | base_b<id>/   compacted bases (writer layout)
  *   dir/store/delta_b<id>/              one stamped delta per batch
  *   dir/store/CURRENT                   → current base name
  *   dir/state/v_boot | v_b<id>/         Maintenance state snapshots
  *   dir/state/CURRENT                   → last APPLIED batch's state
  *
  * Crash contract (the [[DocsStream.nearDedupStream]] discipline,
  * extended to mutable state): every per-batch write is OVERWRITE into
  * a batch-named location, and both pointers swap atomically only
  * after their payload is complete — so a crash at any point leaves
  * the committed view (state pointer + bases/deltas it admits) on a
  * complete snapshot, and a replayed batch either (a) detects its own
  * state version in CURRENT and skips whole, or (b) re-runs the tick
  * from the pre-batch state, rewriting its own delta/base instead of
  * appending duplicates. The serving view ([[currentView]]) admits
  * only deltas the state pointer has committed — an in-flight batch's
  * delta is invisible until its state swap lands. Mid-tick compaction
  * is replay-safe for the same reason: a base named for the batch
  * excludes the batch's own delta from the replayed read (its rows are
  * already folded in), and the tombstone anti-join it re-applies is
  * idempotent.
  *
  * Cost shape per batch: O(delta + tombstones) — the tick's contract —
  * plus the one corpus-sized rewrite whenever the compaction trigger
  * fires (which this runner schedules instead of letting the tombstone
  * broadcast grow unbounded; ScaleBench pins the flat-tick evidence at
  * 1M and 10M docs).
  */
object IndexMaintenanceStream {

  /** Batch id encoded in a version/dir name: `v_b7`/`base_b7`/
    * `delta_b7` → 7; the boot names → -1. */
  private def parseBatch(version: String): Long =
    if (version.endsWith("boot")) -1L
    else version.substring(version.lastIndexOf('b') + 1).toLong

  /** A [[Maintenance.Store]] over the versioned layout: rows = current
    * base ∪ committed deltas (strictly newer than the base, at most
    * `upToBatch`); append lands in this batch's delta dir (overwrite —
    * a replay rewrites itself); a fired compaction writes a base named
    * for this batch, swaps the store pointer, and sweeps everything it
    * folded in. */
  final class VersionedStore(spark: SparkSession, storeDir: String,
                             writer: (DataFrame, String, String) => Unit,
                             upToBatch: Long) extends Maintenance.Store {
    private def fs = {
      val p = new org.apache.hadoop.fs.Path(storeDir)
      (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    }
    private def baseName: String =
      DocsStream.readPointer(spark, storeDir).getOrElse(
        sys.error(s"no CURRENT base under $storeDir — bootstrap first"))

    def rows: DataFrame = {
      val base = baseName
      val baseBatch = parseBatch(base)
      val (hfs, root) = fs
      val deltas = hfs.listStatus(root).toSeq
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("delta_b"))
        .map(n => n -> parseBatch(n))
        .collect { case (n, b) if b > baseBatch && b <= upToBatch => n }
      // one read per version dir: each is a self-contained
      // hive-partitioned table (a multi-path read would cross-wire
      // their partition discovery)
      (base +: deltas).map(n => spark.read.parquet(s"$storeDir/$n"))
        .reduce(_ unionByName _)
    }

    def append(delta: DataFrame): Unit = {
      val dst = s"$storeDir/delta_b$upToBatch"
      writer(delta, dst, "overwrite")
      // a delete/update-only batch appends an EMPTY frame: a
      // partitioned empty write leaves a dir with no data files that
      // every later read chokes on — drop it (no extra Spark job)
      val (hfs, _) = fs
      def hasData(p: org.apache.hadoop.fs.Path): Boolean =
        hfs.listStatus(p).exists(st =>
          if (st.isDirectory) hasData(st.getPath)
          else st.getLen > 0 && !st.getPath.getName.startsWith("_"))
      val dp = new org.apache.hadoop.fs.Path(dst)
      if (hfs.exists(dp) && !hasData(dp)) { hfs.delete(dp, true); () }
    }

    def rewrite(live: DataFrame): Unit = {
      val target = s"base_b$upToBatch"
      val side = s"$storeDir/$target.tmp"
      writer(live, side, "overwrite") // materializes BEFORE any delete
      val (hfs, root) = fs
      val dst = new org.apache.hadoop.fs.Path(root, target)
      if (hfs.exists(dst)) hfs.delete(dst, true)
      hfs.rename(new org.apache.hadoop.fs.Path(side), dst)
      val folded = parseBatch(baseName) // still the OLD base
      DocsStream.swapPointer(spark, storeDir, target)
      // sweep only after the swap: everything the new base folded in
      hfs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        val stale = st.isDirectory && n != target &&
          ((n.startsWith("base_") && parseBatch(n) <= folded) ||
            (n.startsWith("delta_b") && parseBatch(n) <= upToBatch))
        if (stale) hfs.delete(st.getPath, true)
      }
      ()
    }
  }

  /** Seed the layout: the base corpus indexed and stamped generation 0,
    * plus the initial state (stats for a stats-keeping door). */
  def bootstrap(spark: SparkSession, door: Maintenance.Door, dir: String,
                writer: (DataFrame, String, String) => Unit,
                docs: DataFrame): Unit = {
    writer(door.stamp(door.index(docs), 0L), s"$dir/store/base_boot",
      "overwrite")
    DocsStream.swapPointer(spark, s"$dir/store", "base_boot")
    val st = Maintenance.initialState(spark, door, door.statsDelta(docs))
    Maintenance.saveState(st, s"$dir/state/v_boot")
    DocsStream.swapPointer(spark, s"$dir/state", "v_boot")
  }

  /** Apply ONE mutation micro-batch — idempotent on replay. `batch`
    * carries an `op` column plus the door's payload columns; update
    * rows of a stats-keeping door must also carry the superseded
    * version (extracted by `oldVersion`, e.g.
    * `u => u.select(col("doc_id"), col("old_text").as("text"))`). */
  def applyBatch(spark: SparkSession, door: Maintenance.Door, dir: String,
                 writer: (DataFrame, String, String) => Unit,
                 batch: DataFrame, batchId: Long,
                 oldVersion: Option[DataFrame => DataFrame] = None,
                 compactThresholdBytes: Long = 10L << 20): Unit = {
    val applied = DocsStream.readPointer(spark, s"$dir/state")
    if (applied.contains(s"v_b$batchId")) return // replay of a done batch
    val st = Maintenance.loadState(spark,
      s"$dir/state/${applied.getOrElse(sys.error(
        s"no CURRENT state under $dir/state — bootstrap first"))}")
    val payload = batch.columns.filter(_ != "op").map(col).toSeq
    def part(op: String) =
      batch.where(col("op") === op).select(payload: _*)
    val updates = part("update")
    val store = new VersionedStore(spark, s"$dir/store", writer, batchId)
    val st2 = Maintenance.tick(door, store, st,
      adds = part("add"), deletes = part("delete"), updates = updates,
      updatesOld = oldVersion.map(f => f(updates)),
      compactThresholdBytes = compactThresholdBytes)
    Maintenance.saveState(st2, s"$dir/state/v_b$batchId")
    DocsStream.swapPointer(spark, s"$dir/state", s"v_b$batchId")
    DocsStream.sweepStale(spark, s"$dir/state", keep = s"v_b$batchId")
  }

  /** The tailer: one [[applyBatch]] per micro-batch. */
  def mutationStream(mutations: DataFrame, door: Maintenance.Door,
                     dir: String,
                     writer: (DataFrame, String, String) => Unit,
                     checkpointDir: String,
                     oldVersion: Option[DataFrame => DataFrame] = None,
                     compactThresholdBytes: Long = 10L << 20)
      : StreamingQuery =
    mutations.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b.sparkSession, door, dir, writer, b, id, oldVersion,
          compactThresholdBytes)
        ()
      }
      .start()

  /** The committed serving view: tombstone-filtered live rows (only
    * deltas the state pointer admits — an in-flight batch is
    * invisible) plus the door's stats, ready for
    * `Bm25Index.search` / `Similarity.ivfTopKIndexedPruned` /
    * `Dedup.incrementalDedup`. */
  def currentView(spark: SparkSession, door: Maintenance.Door,
                  dir: String): (DataFrame, Option[DataFrame]) = {
    val v = DocsStream.readPointer(spark, s"$dir/state").getOrElse(
      sys.error(s"no CURRENT state under $dir/state"))
    val st = Maintenance.loadState(spark, s"$dir/state/$v")
    val store = new VersionedStore(spark, s"$dir/store",
      (_, _, _) => sys.error("serving view never writes"), parseBatch(v))
    (st.live(door, store), st.stats)
  }
}
