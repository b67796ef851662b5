package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{CachedQueries, Security, SuggestionsService, WebServer}
import graft.operators.QuantileCensus
import graft.pipeline.{Bm25Index, Dedup, Maintenance, Similarity}

/** The lifecycle soak: every maintenance door the engine has, driven
  * TOGETHER through ten ticks of mixed adds / deletes / updates /
  * re-sent deletes / deletes-of-updated / re-adds-of-deleted — the run
  * a production operator would trust, and the closest sandbox analogue
  * of the reference's live-update MiniCluster suite
  * (`TestWithMiniClusterBase.java`, which needs HDFS this environment
  * lacks). Each door is already spec'd in isolation; this pins that
  * they compose — through [[pipeline.Maintenance.tick]], the SAME
  * one-call orchestration the ScaleBench lifecycle stages measure:
  *
  *  - BM25 postings + IVF cells + dedup signatures are each maintained
  *    as a generation-versioned store behind ONE unified tombstone
  *    table (the persisted-store composition) and end the run EQUAL
  *    (full index-frame multiset equality, not just probe agreement)
  *    to a fresh rebuild on the surviving corpus, after interleaved
  *    deletes, generation updates, deletes of PREVIOUSLY-UPDATED ids
  *    (the round-12 silent-swallow path), re-sent deletes (suppressed
  *    by the gen-aware guard), re-adds of previously-deleted ids
  *    (tombstone demotion), and mid-run physical compactions fired by
  *    `Dedup.compactNeeded` inside the tick;
  *  - the quantile-census serving table compacts through the
  *    self-trimming door every tick and its image bytes never leave the
  *    trim policy's budget;
  *  - the suggestions service folds an inode delta each tick and
  *    `/getCachedQuery` serves the post-delta answer at EVERY tick.
  */
class LifecycleSoakSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nBuckets = 32
  private val eps = 0.01
  private val trimEps = 0.02
  private val qTerms = Seq("w7", "w42", "w123", "w311")

  /** Deterministic, well-mixed token stream: different (id, version)
    * pairs share no shingle runs, so dedup keeps every soak doc (a
    * LINEAR-in-j generator makes every doc a shifted arithmetic
    * progression — heavily shared shingles — hence the splitmix). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def text(id: Long, ver: Int): String =
    (0 until (8 + (id % 7)).toInt).map { j =>
      s"w${(mix(id * 1000003L + ver * 10007L + j) >>> 16) % 400}"
    }.mkString(" ")

  private def emb(id: Long, ver: Int): Array[Float] =
    Array.tabulate(8) { d =>
      ((id * 31 + ver * 7 + d * 13) % 1000) / 500.0f - 1.0f
    }

  private def docsDf(docs: Seq[(Long, Int)]): DataFrame =
    docs.map { case (id, v) => (id, text(id, v)) }.toDF("doc_id", "text")

  private def vecsDf(docs: Seq[(Long, Int)]): DataFrame =
    docs.map { case (id, v) => (id, emb(id, v)) }.toDF("vec_id", "embedding")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: Seq[_] => a.toVector
      case x => x
    }).toSeq.sortBy(_.mkString("|"))

  /** assert frame multiset equality, reporting only the symmetric
    * difference (a raw two-frame dump is unreadable at soak size). */
  private def assertSameRows(got0: DataFrame, want0: DataFrame,
                             what: String): Unit = {
    // align column ORDER by name (a USING-join moves its key first)
    val cols = got0.columns.sorted.map(col).toSeq
    val got = got0.select(cols: _*); val want = want0.select(cols: _*)
    val g = sortedRows(got); val w = sortedRows(want)
    if (g != w) {
      val extra = g.diff(w).take(10); val missing = w.diff(g).take(10)
      fail(s"$what: ${g.size} vs ${w.size} rows; " +
        s"extra=$extra missing=$missing")
    }
  }

  test("ten Maintenance.tick rounds of adds/deletes/updates/" +
      "delete-after-update/re-sent deletes/re-adds through BM25 + IVF " +
      "+ dedup gen stores with census trim and per-tick cached-query " +
      "freshness: every index ends equal to a fresh rebuild") {
    // ---- ground truth the ticks mutate ----
    val live = scala.collection.mutable.LinkedHashMap[Long, Int](
      (0L until 120L).map(_ -> 0): _*)
    // ids updated in SOME earlier tick and still live — the pool the
    // delete-after-update picks from (the round-12 swallow path)
    val updatedEver = scala.collection.mutable.Set.empty[Long]
    // ids whose full-delete tombstone is still LIVE (uncompacted) — the
    // only ids a re-sent delete can be guarded against; once compaction
    // drops the tombstone table the id's history is gone by design
    val tombstonedText = scala.collection.mutable.Map.empty[Long, String]
    // every deleted id with the version it died at (re-add pool)
    val deletedEver = scala.collection.mutable.Map.empty[Long, Int]
    var nextId = 120L

    // ---- initial serving state (tick 0): three gen-versioned stores
    // behind Maintenance doors, base load stamped gen 0 ----
    val corpus0 = docsDf(live.toSeq)
    val bmDoor = new Maintenance.Bm25Door(col("text"), nBuckets)
    val (p0, s0) =
      Bm25Index.build(corpus0, col("doc_id"), col("text"), nBuckets)
    val bmStore = new Maintenance.FrameStore(Bm25Index.stampGen(p0, 0L))
    var bmSt = Maintenance.initialState(spark, bmDoor, Some(s0))

    val cents = Similarity.centroids(vecsDf(live.toSeq), 16) // frozen
    val ivfDoor = new Maintenance.IvfDoor(cents)
    val ivfStore = new Maintenance.FrameStore(
      Similarity.ivfStampGen(
        Similarity.ivfAssign(vecsDf(live.toSeq), cents), 0L))
    var ivfSt = Maintenance.initialState(spark, ivfDoor)

    val sigDoor = new Maintenance.SigDoor("doc_id", col("text"), 3, 64)
    val sigStore = new Maintenance.FrameStore(
      Dedup.sigStampGen(Dedup.minhashSignatures(corpus0, "doc_id",
        col("text"), 3, 64), 0L))
    var sigSt = Maintenance.initialState(spark, sigDoor)

    def censusBatch(tick: Int): DataFrame =
      (for (seg <- 0 until 4; i <- 0 until 300) yield (seg.toLong,
        ((i * 2654435761L + (tick * 4 + seg) * 40503L) % 10000).toDouble))
        .toDF("seg", "v")
    var digests = QuantileCensus.build(censusBatch(0), Seq(col("seg")),
      col("v"), eps)
    def digestBudget(n: Long): Double = {
      val entries = (1.0 / (2 * eps)) *
        (math.log(math.max(2 * eps * n, 2.0)) / math.log(2.0) + 2.0) + 16.0
      3.0 * (24.0 + 24.0 * entries)
    }
    var digestTraces = Vector.empty[(Long, Long)] // (maxBytes, perSegN)

    // ---- suggestions service + cached query over a per-tick inode
    // delta (the incremental census folding alongside the doc churn) --
    val nowMs = 1700000000000L
    def files(ids: org.apache.spark.sql.Dataset[java.lang.Long]) =
      ids.select(col("id"),
        format_string("/soak/f%06d", col("id")).as("path"),
        lit(true).as("isFile"), lit("u1").as("user"),
        lit(100L).as("fileSize"), lit(0L).as("modTime"),
        lit(0L).as("accessTime"), lit(1L).as("numBlocks"),
        lit(3L).as("fileReplica"), lit(-1L).as("nsQuota"),
        lit(-1L).as("dsQuota"), lit(false).as("hasQuota"),
        lit(0L).as("dirNumChildren"), lit(0L).as("nsQuotaUsed"),
        lit(0L).as("dsQuotaUsed"))
        .withColumn("name", element_at(split(col("path"), "/"), -1))
    val nTicks = 10
    val snaps = (0 to nTicks).map(t =>
      files(spark.range(30 + 3L * t)).localCheckpoint())
    val opss = (1 to nTicks).map(t =>
      files(spark.range(30 + 3L * (t - 1), 30 + 3L * t))
        .select(lit("OP_ADD").as("opcode"), col("path"))
        .withColumn("dst", lit(""))
        .withColumn("srcs", lit(null).cast("array<string>"))
        .localCheckpoint())
    val snapIt = snaps.iterator
    val opsIt = opss.iterator
    val svc = new SuggestionsService.Service(spark, snaps.head, None,
      intervalMs = 3600000L, clock = () => nowMs,
      snapshotProvider = Some(() => snapIt.next()),
      editTailProvider = Some(() => opsIt.next()))
    val ws = new WebServer(spark, snaps.head, "/root/testdata/sf0.001",
      new Security.Context(Nil, "k".getBytes(UTF_8)),
      suggestionsService = Some(svc))
    ws.start()

    def served(): Long = {
      val url = new URI(s"http://127.0.0.1:${ws.boundPort}" +
        "/getCachedQuery?name=soakq").toURL
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      val status = conn.getResponseCode
      val body = new String(conn.getInputStream.readAllBytes(), UTF_8)
      conn.disconnect()
      assert(status === 200, body)
      body.trim.split('\n')(1).trim.toLong
    }
    def awaitCycles(k: Int): Unit = {
      val dl = System.currentTimeMillis() + 90000
      while (svc.history.size < k && System.currentTimeMillis() < dl)
        Thread.sleep(50)
      assert(svc.history.size >= k, s"cycle $k never completed")
    }

    var delAfterUpd = 0 // ticks that deleted a previously-updated id
    var reAdds = 0
    try {
      val url = new URI(s"http://127.0.0.1:${ws.boundPort}" +
        "/setCachedQuery?name=soakq&set=files&filters=user:eq:u1&sum=count")
        .toURL
      val c = url.openConnection().asInstanceOf[HttpURLConnection]
      assert(c.getResponseCode === 200); c.disconnect()
      svc.runNow(); awaitCycles(1) // full rebase seeds the fold state
      assert(served() === 30L)

      // ------------------------- the ticks -------------------------
      for (tick <- 1 to nTicks) {
        // mutation plan over current live ids: plain deletes, updates,
        // one delete of a PREVIOUSLY-updated id (unified-table path),
        // one RE-SENT delete of a still-tombstoned id (must be
        // suppressed or stats drift), one re-add of a dead id, adds
        val delIds = live.keys.filter(_ % 9 == tick % 9).take(7).toVector
        val updIds = live.keys
          .filter(id => id % 7 == tick % 7 && !delIds.contains(id))
          .take(6).toVector
        val delUpdIds = (updatedEver -- delIds -- updIds)
          .intersect(live.keySet).take(2).toVector
        val addIds = (nextId until nextId + 12).toVector
        nextId += 12
        val reAddIds = if (tick % 3 == 0)
          (deletedEver.keySet -- live.keySet).take(1).toVector
        else Vector.empty

        val deleting = (delIds ++ delUpdIds).map(id => (id, live(id)))
        val resent = tombstonedText.headOption.map { case (id, t) =>
          Seq((id, t)).toDF("doc_id", "text")
        }
        val delBatchDocs = resent
          .fold(docsDf(deleting))(docsDf(deleting).unionByName(_))
        val adding = addIds.map(_ -> 0) ++
          reAddIds.map(id => id -> (deletedEver(id) + 1))
        val updating = updIds.map(id => id -> (live(id) + 1))

        // arrivals must clear the dedup gate against the LIVE signature
        // view before they enter any store (the ingestion composition;
        // unique soak texts -> everything kept)
        val (kept, _) = Dedup.incrementalDedup(
          docsDf(adding ++ updating), "doc_id", col("text"),
          sigSt.live(sigDoor, sigStore).drop("gen"))
        assert(kept.count() === (adding ++ updating).size.toLong,
          s"tick $tick: dedup filtered a unique soak doc")

        // ---- the three gen stores advance through the SAME call the
        // ScaleBench lifecycle stages measure
        val bmCompactionsBefore = bmSt.compactions
        bmSt = Maintenance.tick(bmDoor, bmStore, bmSt,
          adds = docsDf(adding),
          deletes = delBatchDocs,
          updates = docsDf(updating),
          updatesOld = Some(docsDf(updIds.map(id => id -> live(id)))),
          compactThresholdBytes = 64L * 40)
        ivfSt = Maintenance.tick(ivfDoor, ivfStore, ivfSt,
          adds = vecsDf(adding),
          deletes = vecsDf(deleting), // resend not needed: no stats
          updates = vecsDf(updating),
          compactThresholdBytes = 64L * 40)
        sigSt = Maintenance.tick(sigDoor, sigStore, sigSt,
          adds = docsDf(adding),
          deletes = docsDf(deleting),
          updates = docsDf(updating),
          compactThresholdBytes = 64L * 40)

        // ground truth catches up
        if (delUpdIds.nonEmpty) delAfterUpd += 1
        reAdds += reAddIds.size
        (delIds ++ delUpdIds).foreach { id =>
          tombstonedText(id) = text(id, live(id))
          deletedEver(id) = live(id); live.remove(id)
        }
        updIds.foreach { id => live(id) = live(id) + 1; updatedEver += id }
        addIds.foreach(id => live(id) = 0)
        reAddIds.foreach { id =>
          live(id) = deletedEver(id) + 1
          tombstonedText.remove(id); deletedEver.remove(id)
          updatedEver -= id
        }
        // a fired compaction retires the delete history: re-sent
        // deletes of compacted ids can no longer be recognized
        if (bmSt.compactions > bmCompactionsBefore) tombstonedText.clear()

        // census digests: append + self-trimming compaction every tick
        digests = QuantileCensus.compactSelfTrimming(
          QuantileCensus.add(digests, censusBatch(tick), Seq(col("seg")),
            col("v"), eps), Seq(col("seg")), eps, trimEps)
          .localCheckpoint()
        val mb = digests.select(max(length(col("digest"))))
          .collect().head.getInt(0).toLong
        digestTraces :+= ((mb, (tick + 1) * 300L))

        // suggestions tick: incremental fold + registry refresh; the
        // cached query must serve THIS tick's namespace
        svc.runNow(); awaitCycles(tick + 1)
        assert(served() === 30L + 3L * tick,
          s"tick $tick: /getCachedQuery stale")
      }
      assert(svc.latestCensus.get.folds === nTicks,
        "ticks must fold incrementally, not rebase")
      assert(bmSt.compactions >= 1,
        "the soak never crossed the compaction threshold — deepen it")
      assert(delAfterUpd >= 5,
        s"delete-after-update exercised only $delAfterUpd times")
      assert(reAdds >= 2, s"re-add exercised only $reAdds times")

      // ---------------- end-state vs fresh rebuilds ----------------
      val liveDocs = docsDf(live.toSeq)
      // (1) BM25: stats, postings, and scores all equal the rebuild
      val (pf, sf) = Bm25Index.build(liveDocs, col("doc_id"), col("text"),
        nBuckets)
      assert(bmSt.stats.get.collect().toSeq === sf.collect().toSeq,
        "BM25 stats drifted from the surviving corpus")
      val livePost = bmSt.live(bmDoor, bmStore)
      assertSameRows(livePost.drop("gen"), pf,
        "BM25 postings vs fresh rebuild")
      val gotSearch = Bm25Index.search(livePost, bmSt.stats.get, qTerms,
        20, nBuckets).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val wantSearch = Bm25Index.search(pf, sf, qTerms, 20, nBuckets)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(gotSearch.nonEmpty && gotSearch === wantSearch)
      // (2) IVF: index rows and probe ranks equal the rebuild under the
      // frozen quantizer
      val liveIvf = ivfSt.live(ivfDoor, ivfStore)
      val rebuiltIvf = Similarity.ivfAssign(vecsDf(live.toSeq), cents)
      assertSameRows(liveIvf.select($"cell", $"nid"),
        rebuiltIvf.select($"cell", $"nid"), "IVF cells vs fresh rebuild")
      val q = vecsDf(live.toSeq.take(5))
      def ranks(df: DataFrame) = Similarity
        .ivfTopKIndexed(q, df, cents, 5, nprobe = 4)
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
      val gotRanks = ranks(liveIvf)
      assert(gotRanks.nonEmpty && gotRanks === ranks(rebuiltIvf))
      // (3) dedup signatures equal a rebuild on the survivors
      assertSameRows(sigSt.live(sigDoor, sigStore).drop("gen"),
        Dedup.minhashSignatures(liveDocs, "doc_id", col("text"), 3, 64),
        "signature index vs fresh rebuild")
      // (4) digest bytes stayed inside the trim budget at EVERY tick,
      // and the policy is quiet at the end
      digestTraces.zipWithIndex.foreach { case ((b, n), i) =>
        assert(b <= digestBudget(n),
          s"tick ${i + 1}: digest bytes $b over budget " +
            s"${digestBudget(n)} trace=$digestTraces")
      }
      assert(!QuantileCensus.trimNeeded(digests, eps),
        "census left needing a trim despite the per-tick policy")
    } finally {
      svc.stop(); ws.stop(); CachedQueries.remove("soakq")
    }
  }
}
