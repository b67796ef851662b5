package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of a lexical (BM25)
  * leg and a vector (cosine) leg — the standard first-stage ranker of a
  * RAG / training-data-curation stack (Cormack et al., SIGIR 2009: RRF
  * outperforms either leg alone and needs no score calibration between
  * legs, only ranks).
  *
  * Scale shape: each leg is one of the engine's existing top-k
  * operators — the BM25 posting-index probe (bucket-pruned parquet
  * scan) and the IVF partition-pruned cosine probe — so the corpus-
  * sized work is exactly what those legs already pay; the fusion
  * itself runs over 2·legK rows (tiny by construction: a groupBy on a
  * frame whose size is the sum of the leg ks, independent of corpus
  * size). Nothing here adds a corpus-sized shuffle on top of the legs.
  *
  * Determinism: fusion is integer-exact — `rrf_ppm = Σ_legs 1000000
  * div (k0 + rank)` over bigint ranks, so the fused ordering mirrors
  * in ANSI SQL for the DuckDB oracle; ranks inside each leg carry the
  * engine's deterministic tie-break (score desc, id asc).
  */
object Retrieval {

  /** The single-query entry points fuse with [[rrfFuse]], which merges
    * ALL rows of each leg into ONE ranked list — a multi-query frame
    * would silently interleave per-qid ranks into a meaningless fused
    * result. Guard: at most one query ROW, checked with a
    * short-circuiting limit-2 scan (no distinct — a duplicate-row
    * frame is equally invalid input for the probes' cross joins, and
    * skipping the distinct keeps the guard a shuffle-free sub-second
    * probe on the serving path; query frames are serving-batch sized
    * by contract — the IVF probe's cell resolution already collects
    * from the same frame). */
  private def requireSingleQuery(queryVecs: DataFrame): Unit = {
    val ids = queryVecs.select(col("vec_id")).limit(2).collect()
    require(ids.length <= 1, "this entry point fuses a SINGLE query; " +
      s"got ${ids.length}+ rows in queryVecs — use the " +
      "batched variant (hybridTopKBatch / hybridFromStoresBatch) for " +
      "multi-query frames")
  }

  /** Rank a BM25 `(doc_id, score)` top-k result 1..k. The input is
    * already k-sized (both [[TextAnalysis.bm25TopK]] and
    * [[Bm25Index.search]] end in `.limit(k)`), so the unpartitioned
    * window runs over k rows on one task — never corpus-sized. */
  def rankLex(topk: DataFrame): DataFrame =
    topk.select(col("doc_id"),
      row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc))
        .cast("long").as("rank"))

  /** Fuse ranked legs — each `(doc_id, rank)` with rank 1-based — into
    * the RRF top-k: `rrf_ppm = Σ w_leg div (k0 + rank)` summed over
    * the legs a doc appears in, ties broken by doc_id. `n_legs` counts
    * the contributing legs (2 = found by both lexical and vector
    * search). k0 = 60 is the constant from the RRF paper; `weights`
    * (ppm per leg, default 1,000,000 each) is the standard
    * lexical-vs-semantic tuning knob — integer weights keep the fused
    * ordering exactly SQL-mirrorable. */
  def rrfFuse(legs: Seq[DataFrame], k: Int, k0: Int = 60,
              weights: Seq[Long] = Nil): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    require(weights.isEmpty || weights.size == legs.size,
      s"${weights.size} weights for ${legs.size} legs")
    val ws =
      if (weights.isEmpty) Seq.fill(legs.size)(1000000L) else weights
    val all = legs.zip(ws).map { case (l, w) => l.select(
      col("doc_id").cast("long").as("doc_id"),
      col("rank").cast("long").as("rank"),
      lit(w).as("__w")) }.reduce(_ unionByName _)
    all.groupBy("doc_id")
      .agg(sum(expr(s"__w div ($k0 + rank)")).as("rrf_ppm"),
        count(lit(1)).as("n_legs"))
      .orderBy(col("rrf_ppm").desc, col("doc_id").asc)
      .limit(k)
  }

  /** CONSISTENT hybrid over two tailer-maintained stores
    * ([[graft.streaming.IndexMaintenanceStream]] layouts under
    * `bmDir` and `ivfDir`, fed by the same logical mutation stream):
    * both stores resolve AT THE SAME COMMITTED BATCH — the newest
    * batch BOTH state pointers have committed — so a mutation that
    * landed in one store but not yet the other is invisible to the
    * fused answer instead of serving a lexical leg and a vector leg
    * from different corpus versions. Rides [[graft.streaming
    * .IndexMaintenanceStream.viewAt]], so the older store's view costs
    * nothing extra and the newer store's view is reconstructable for
    * at least the reader-grace window (the two pointers can only drift
    * by the stream's in-flight batches — far inside it). */
  def hybridFromStores(spark: org.apache.spark.sql.SparkSession,
                       bmDoor: Maintenance.Door, bmDir: String,
                       nBuckets: Int,
                       ivfDoor: Maintenance.Door, ivfDir: String,
                       cents: Seq[(Long, Array[Double])],
                       queryVecs: DataFrame, qTerms: Seq[String],
                       k: Int, legK: Int = 20, nprobe: Int = 4,
                       k0: Int = 60): DataFrame = {
    import graft.streaming.IndexMaintenanceStream
    requireSingleQuery(queryVecs)
    val asOf = math.min(
      IndexMaintenanceStream.committedBatch(spark, bmDir),
      IndexMaintenanceStream.committedBatch(spark, ivfDir))
    val (bmView, bmStats) =
      IndexMaintenanceStream.viewAt(spark, bmDoor, bmDir, asOf)
    val (ivfView, _) =
      IndexMaintenanceStream.viewAt(spark, ivfDoor, ivfDir, asOf)
    // bmView goes to search UNMATERIALIZED: search's own lazy
    // localCheckpoint holds only the bucket-pruned probe-sized posting
    // subset — an eager corpus-sized checkpoint here would defeat the
    // pruning on every serving query (and, under reliableCheckpoint,
    // leak one durable checkpoint dir per query)
    val lex = rankLex(Bm25Index.search(bmView,
      bmStats.get, qTerms, legK, nBuckets))
    val vec = Similarity.ivfTopKIndexedPruned(queryVecs, ivfView, cents,
      legK, nprobe)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0)
  }

  /** The BATCHED store-backed hybrid — the deployment tier's shape:
    * B queries answered from the two tailer-maintained stores at ONE
    * consistent `asOf` (the min-committed-batch rule of
    * [[hybridFromStores]]), with both index scans amortized across the
    * batch — [[Bm25Index.searchBatch]] reads the UNION of all queries'
    * posting buckets once, and the IVF probe resolves the union of all
    * queries' cells into one partition-pruned scan
    * ([[Similarity.ivfTopKIndexedPruned]] batches natively). Work is
    * O(touched buckets + probed cells), not O(B × either) — the batch
    * amortization [[Bm25Index.searchBatch]]'s spec pins, now riding the
    * tombstone-filtered serving views. `weights` = per-leg ppm
    * (lexical, vector), the same knob as [[rrfFuse]]. `allowed`
    * (optional — first column = allowed doc/vector ids) is the
    * metadata slice of [[hybridTopKIndexedFiltered]] on the batch
    * tier: the mask semi-joins each leg's probe-sized candidates
    * BEFORE its per-qid top-k (scoring stays global on both legs —
    * Lucene-filter / FAISS-IDSelector semantics), so filtering and
    * batch amortization compose instead of excluding each other. */
  def hybridFromStoresBatch(spark: org.apache.spark.sql.SparkSession,
                            bmDoor: Maintenance.Door, bmDir: String,
                            nBuckets: Int,
                            ivfDoor: Maintenance.Door, ivfDir: String,
                            cents: Seq[(Long, Array[Double])],
                            queryVecs: DataFrame,
                            queries: Seq[(Long, Seq[String])], k: Int,
                            legK: Int = 20, nprobe: Int = 4,
                            k0: Int = 60,
                            weights: Seq[Long] = Nil,
                            allowed: Option[DataFrame] = None)
      : DataFrame = {
    import graft.streaming.IndexMaintenanceStream
    val asOf = math.min(
      IndexMaintenanceStream.committedBatch(spark, bmDir),
      IndexMaintenanceStream.committedBatch(spark, ivfDir))
    val (bmView, bmStats) =
      IndexMaintenanceStream.viewAt(spark, bmDoor, bmDir, asOf)
    val (ivfView, _) =
      IndexMaintenanceStream.viewAt(spark, ivfDoor, ivfDir, asOf)
    val lex = allowed.fold(
      Bm25Index.searchBatch(bmView, bmStats.get, queries, legK,
        nBuckets))(a =>
      Bm25Index.searchBatchFiltered(bmView, bmStats.get, queries, legK,
        nBuckets, a))
      .select(col("qid"), col("doc_id"), col("rank"))
    val vec = allowed.fold(
      Similarity.ivfTopKIndexedPruned(queryVecs, ivfView, cents,
        legK, nprobe))(a =>
      Similarity.ivfTopKIndexedPrunedFiltered(queryVecs, ivfView, cents,
        legK, nprobe, a))
      .select(col("qid"), col("nid").as("doc_id"), col("rank"))
    rrfFuseByQuery(Seq(lex, vec), k, k0, weights)
  }

  /** Index-free hybrid top-k: BM25-score `docs` for `qTerms` and
    * cosine-rank `emb` against the embedding of `qid`, fuse with RRF
    * (optionally weighted — `weights` = (lexical, vector) ppm). The
    * correctness baseline — the indexed variant below must agree when
    * its index is exact. */
  def hybridTopK(docs: DataFrame, emb: DataFrame, idCol: Column,
                 text: Column, qTerms: Seq[String], qid: Long, k: Int,
                 legK: Int = 20, k0: Int = 60,
                 weights: Seq[Long] = Nil): DataFrame = {
    val lex = rankLex(TextAnalysis.bm25TopK(docs, idCol, text, qTerms,
      legK))
    val vec = Similarity.bruteForceTopK(
      emb.where(col("vec_id") === qid), emb, legK)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0, weights)
  }

  /** Per-query RRF fusion for a BATCH of queries: each leg carries
    * `(qid, doc_id, rank)` with rank 1-based within its qid; the fused
    * top-k is computed independently per qid (same integer-exact sum
    * as [[rrfFuse]], same doc_id tie-break). Output `(qid, doc_id,
    * rrf_ppm, n_legs, rank)`. The per-qid window runs over the fused
    * candidates only — at most legs·legK rows per query. */
  def rrfFuseByQuery(legs: Seq[DataFrame], k: Int,
                     k0: Int = 60,
                     weights: Seq[Long] = Nil): DataFrame = {
    require(legs.nonEmpty, "rrfFuseByQuery needs at least one leg")
    require(weights.isEmpty || weights.size == legs.size,
      s"${weights.size} weights for ${legs.size} legs")
    val ws =
      if (weights.isEmpty) Seq.fill(legs.size)(1000000L) else weights
    val all = legs.zip(ws).map { case (l, lw) => l.select(
      col("qid").cast("long").as("qid"),
      col("doc_id").cast("long").as("doc_id"),
      col("rank").cast("long").as("rank"),
      lit(lw).as("__w")) }.reduce(_ unionByName _)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_ppm").desc, col("doc_id").asc)
    all.groupBy("qid", "doc_id")
      .agg(sum(expr(s"__w div ($k0 + rank)")).as("rrf_ppm"),
        count(lit(1)).as("n_legs"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Batched serving-path hybrid: B queries answered in ONE pass over
    * each index — [[Bm25Index.searchBatch]] reads every touched
    * posting bucket once for all queries' terms, the IVF probe batches
    * natively ([[Similarity.ivfTopKIndexed]] broadcasts all probe
    * cells), and the fusion is per-qid. `queries` pairs each qid with
    * its term list; `queryVecs` carries the same qids as `vec_id`
    * rows. This is the deployment shape: amortizing the index scans
    * over the query batch is what makes a high-QPS serving tier pay
    * O(touched buckets), not O(B · touched buckets). `weights` =
    * per-leg ppm (lexical, vector) — the same tuning knob as
    * [[rrfFuse]]'s, so the batched tier serves the weighted ranker
    * too (spec-pinned: batch-with-weights ≡ per-query weighted
    * fusion). `allowed` (optional — first column = allowed ids) is
    * the metadata slice on the batch tier: both legs' candidates are
    * masked BEFORE their per-qid top-k with global scoring preserved
    * ([[Bm25Index.searchBatchFiltered]] semantics on the lexical leg,
    * a pre-probe semi-join under the frozen quantizer on the vector
    * leg), spec-pinned batched-filtered ≡ per-query filtered. */
  def hybridTopKBatch(postings: DataFrame, stats: DataFrame,
                      nBuckets: Int, ivfIndex: DataFrame,
                      cents: Seq[(Long, Array[Double])],
                      queryVecs: DataFrame,
                      queries: Seq[(Long, Seq[String])], k: Int,
                      legK: Int = 20, nprobe: Int = 4,
                      k0: Int = 60,
                      weights: Seq[Long] = Nil,
                      allowed: Option[DataFrame] = None): DataFrame = {
    val lex = allowed.fold(
      Bm25Index.searchBatch(postings, stats, queries, legK, nBuckets))(
      a => Bm25Index.searchBatchFiltered(postings, stats, queries, legK,
        nBuckets, a))
      .select(col("qid"), col("doc_id"), col("rank"))
    // the mask on the vector leg sits under the probe exactly like
    // ivfTopKIndexedPrunedFiltered's: filtering a vector out never
    // changes another's cell or score, so masked-probe ≡ probe of an
    // index built from only the allowed vectors
    val maskedIvf = allowed.fold(ivfIndex)(a => ivfIndex.join(
      a.select(col(a.columns.head).as("nid")), Seq("nid"), "left_semi"))
    val vec = Similarity.ivfTopKIndexed(queryVecs, maskedIvf, cents,
      legK, nprobe)
      .select(col("qid"), col("nid").as("doc_id"), col("rank"))
    rrfFuseByQuery(Seq(lex, vec), k, k0, weights)
  }

  /** Serving-path hybrid top-k over PREBUILT indexes: the BM25
    * posting index (bucket-pruned probe, [[Bm25Index.search]]) and an
    * IVF cell index under its frozen quantizer
    * ([[Similarity.ivfTopKIndexed]]) — what a deployment runs, with
    * both corpus-sized structures built once and probed per query. */
  def hybridTopKIndexed(postings: DataFrame, stats: DataFrame,
                        nBuckets: Int, ivfIndex: DataFrame,
                        cents: Seq[(Long, Array[Double])],
                        queryVec: DataFrame, qTerms: Seq[String],
                        k: Int, legK: Int = 20, nprobe: Int = 4,
                        k0: Int = 60): DataFrame = {
    requireSingleQuery(queryVec)
    val lex = rankLex(Bm25Index.search(postings, stats, qTerms, legK,
      nBuckets))
    val vec = Similarity.ivfTopKIndexed(queryVec, ivfIndex, cents, legK,
      nprobe)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0)
  }

  /** The SCALAR single-query serving door — `(qid, vector)` instead of
    * a one-row DataFrame, so single-query semantics hold at COMPILE
    * time and the serving hot path pays neither the multi-query guard
    * job (the limit-2 collect of [[requireSingleQuery]]) nor the IVF
    * cell-resolution job (cells resolve driver-side through the same
    * compiled argmax — [[Similarity.probeCellsScalar]]). `allowed`
    * composes the [[hybridTopKIndexedFiltered]] mask; `weights` the
    * per-leg ppm knob. Results ≡ the DataFrame door on the same query
    * (spec-pinned, along with the job-count cut). The DataFrame door
    * stays for callers whose queries already live in a frame. */
  def hybridTopKIndexedScalar(postings: DataFrame, stats: DataFrame,
                              nBuckets: Int, ivfIndex: DataFrame,
                              cents: Seq[(Long, Array[Double])],
                              query: (Long, Seq[Double]),
                              qTerms: Seq[String],
                              k: Int, legK: Int = 20, nprobe: Int = 4,
                              k0: Int = 60,
                              weights: Seq[Long] = Nil,
                              allowed: Option[DataFrame] = None)
      : DataFrame = {
    val ids = allowed.map(a =>
      a.select(col(a.columns.head).as("doc_id")))
    val lex = rankLex(ids.fold(
      Bm25Index.search(postings, stats, qTerms, legK, nBuckets))(a =>
      Bm25Index.searchFiltered(postings, stats, qTerms, legK, nBuckets,
        a)))
    val vec = Similarity.ivfTopKIndexedScalar(query._1, query._2,
      ivfIndex, cents, legK, nprobe, ids)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0, weights)
  }

  /** [[hybridFromStores]]' scalar twin: the consistent two-store
    * serving read with the scalar door's job cuts (no guard job, no
    * cell-resolution job — see [[hybridTopKIndexedScalar]]). */
  def hybridFromStoresScalar(spark: org.apache.spark.sql.SparkSession,
                             bmDoor: Maintenance.Door, bmDir: String,
                             nBuckets: Int,
                             ivfDoor: Maintenance.Door, ivfDir: String,
                             cents: Seq[(Long, Array[Double])],
                             query: (Long, Seq[Double]),
                             qTerms: Seq[String],
                             k: Int, legK: Int = 20, nprobe: Int = 4,
                             k0: Int = 60,
                             weights: Seq[Long] = Nil,
                             allowed: Option[DataFrame] = None)
      : DataFrame = {
    import graft.streaming.IndexMaintenanceStream
    val asOf = math.min(
      IndexMaintenanceStream.committedBatch(spark, bmDir),
      IndexMaintenanceStream.committedBatch(spark, ivfDir))
    val (bmView, bmStats) =
      IndexMaintenanceStream.viewAt(spark, bmDoor, bmDir, asOf)
    val (ivfView, _) =
      IndexMaintenanceStream.viewAt(spark, ivfDoor, ivfDir, asOf)
    val ids = allowed.map(a =>
      a.select(col(a.columns.head).as("doc_id")))
    val lex = rankLex(ids.fold(
      Bm25Index.search(bmView, bmStats.get, qTerms, legK, nBuckets))(a =>
      Bm25Index.searchFiltered(bmView, bmStats.get, qTerms, legK,
        nBuckets, a)))
    val vec = Similarity.ivfTopKIndexedScalar(query._1, query._2,
      ivfView, cents, legK, nprobe, ids)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0, weights)
  }

  /** Hybrid serving from the MEMORY-BOUNDED code-store tier — the
    * [[hybridFromStores]] contract with the vector leg served from a
    * tailer-maintained PQ-CODE store ([[Maintenance.IvfPqDoor]] rows:
    * 8 + m bytes/vector in the ADC working set) plus the exact-rerank
    * tail funded by the full-vector store
    * ([[Similarity.ivfPqTopKIndexedPrunedRerank]]): ADC ranks `rerankC`
    * candidates from the code store, only those queries × rerankC ids
    * refetch full vectors from `vecDir`'s live view. ALL THREE stores
    * (BM25, PQ codes, full vectors) resolve at ONE committed batch —
    * the min-committed rule — so the fused answer never mixes corpus
    * versions across legs or between the ADC stage and its rerank
    * refetch. When `rerankC` covers the probed candidate pool this
    * serves EXACTLY what the full-vector [[hybridFromStores]] serves
    * (spec-pinned) — the knob trades full-vector bytes touched for
    * recall, measured on the 1M ledger. */
  def hybridFromStoresPq(spark: org.apache.spark.sql.SparkSession,
                         bmDoor: Maintenance.Door, bmDir: String,
                         nBuckets: Int,
                         pqDoor: Maintenance.Door, pqDir: String,
                         cents: Seq[(Long, Array[Double])],
                         cbs: Array[Array[Array[Double]]],
                         vecDoor: Maintenance.Door, vecDir: String,
                         queryVecs: DataFrame, qTerms: Seq[String],
                         k: Int, legK: Int = 20, rerankC: Int = 100,
                         nprobe: Int = 4, k0: Int = 60,
                         weights: Seq[Long] = Nil,
                         allowed: Option[DataFrame] = None): DataFrame = {
    requireSingleQuery(queryVecs)
    val (bmView, bmStats, pqView, vectors) =
      pqStoreViews(spark, bmDoor, bmDir, pqDoor, pqDir, vecDoor, vecDir)
    val ids = allowed.map(a =>
      a.select(col(a.columns.head).as("doc_id")))
    val lex = rankLex(ids.fold(
      Bm25Index.search(bmView, bmStats.get, qTerms, legK, nBuckets))(a =>
      Bm25Index.searchFiltered(bmView, bmStats.get, qTerms, legK,
        nBuckets, a)))
    val vec = Similarity.ivfPqTopKIndexedPrunedRerank(queryVecs, pqView,
      cents, cbs, legK, nprobe, rerankC, vectors, ids)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0, weights)
  }

  /** The BATCHED code-store hybrid — [[hybridFromStoresBatch]]'s shape
    * on the PQ tier: B queries, one union-of-buckets lexical pass, one
    * union-of-probed-cells ADC pass over the code store, ONE
    * queries × rerankC full-vector refetch for the whole batch, all
    * three stores at the min-committed batch. */
  def hybridFromStoresPqBatch(spark: org.apache.spark.sql.SparkSession,
                              bmDoor: Maintenance.Door, bmDir: String,
                              nBuckets: Int,
                              pqDoor: Maintenance.Door, pqDir: String,
                              cents: Seq[(Long, Array[Double])],
                              cbs: Array[Array[Array[Double]]],
                              vecDoor: Maintenance.Door, vecDir: String,
                              queryVecs: DataFrame,
                              queries: Seq[(Long, Seq[String])], k: Int,
                              legK: Int = 20, rerankC: Int = 100,
                              nprobe: Int = 4, k0: Int = 60,
                              weights: Seq[Long] = Nil,
                              allowed: Option[DataFrame] = None)
      : DataFrame = {
    val (bmView, bmStats, pqView, vectors) =
      pqStoreViews(spark, bmDoor, bmDir, pqDoor, pqDir, vecDoor, vecDir)
    val lex = allowed.fold(
      Bm25Index.searchBatch(bmView, bmStats.get, queries, legK,
        nBuckets))(a =>
      Bm25Index.searchBatchFiltered(bmView, bmStats.get, queries, legK,
        nBuckets, a))
      .select(col("qid"), col("doc_id"), col("rank"))
    val vec = Similarity.ivfPqTopKIndexedPrunedRerank(queryVecs, pqView,
      cents, cbs, legK, nprobe, rerankC, vectors, allowed)
      .select(col("qid"), col("nid").as("doc_id"), col("rank"))
    rrfFuseByQuery(Seq(lex, vec), k, k0, weights)
  }

  /** [[hybridFromStoresPq]]'s scalar twin: the code-store serving read
    * with the scalar door's job cuts — no guard job, no cell-resolution
    * job ([[Similarity.ivfPqTopKIndexedScalar]] resolves probe cells
    * driver-side and builds the ADC LUT from the LocalRelation query
    * frame). */
  def hybridFromStoresPqScalar(spark: org.apache.spark.sql.SparkSession,
                               bmDoor: Maintenance.Door, bmDir: String,
                               nBuckets: Int,
                               pqDoor: Maintenance.Door, pqDir: String,
                               cents: Seq[(Long, Array[Double])],
                               cbs: Array[Array[Array[Double]]],
                               vecDoor: Maintenance.Door, vecDir: String,
                               query: (Long, Seq[Double]),
                               qTerms: Seq[String],
                               k: Int, legK: Int = 20, rerankC: Int = 100,
                               nprobe: Int = 4, k0: Int = 60,
                               weights: Seq[Long] = Nil,
                               allowed: Option[DataFrame] = None)
      : DataFrame = {
    val (bmView, bmStats, pqView, vectors) =
      pqStoreViews(spark, bmDoor, bmDir, pqDoor, pqDir, vecDoor, vecDir)
    val ids = allowed.map(a =>
      a.select(col(a.columns.head).as("doc_id")))
    val lex = rankLex(ids.fold(
      Bm25Index.search(bmView, bmStats.get, qTerms, legK, nBuckets))(a =>
      Bm25Index.searchFiltered(bmView, bmStats.get, qTerms, legK,
        nBuckets, a)))
    val vec = Similarity.ivfPqTopKIndexedScalar(query._1, query._2,
      pqView, cents, cbs, legK, nprobe,
      rerank = Some((rerankC, vectors)), allowed = ids)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0, weights)
  }

  /** Hybrid serving from the SQ8 tier — the middle of the
    * bytes-vs-recall spectrum serving the fused ranker: the vector leg
    * probes a tailer-maintained [[Maintenance.IvfSq8Door]] store
    * ([[Similarity.sq8TopKIndexedPruned]] — int8 cosine, no rerank
    * tail needed at this tier), both stores at the min-committed
    * batch. `allowed` masks both legs; `weights` the per-leg ppm
    * knob. */
  def hybridFromStoresSq8(spark: org.apache.spark.sql.SparkSession,
                          bmDoor: Maintenance.Door, bmDir: String,
                          nBuckets: Int,
                          sq8Door: Maintenance.Door, sq8Dir: String,
                          cents: Seq[(Long, Array[Double])],
                          queryVecs: DataFrame, qTerms: Seq[String],
                          k: Int, legK: Int = 20, nprobe: Int = 4,
                          k0: Int = 60,
                          weights: Seq[Long] = Nil,
                          allowed: Option[DataFrame] = None): DataFrame = {
    requireSingleQuery(queryVecs)
    val (bmView, bmStats, sq8View) =
      sq8StoreViews(spark, bmDoor, bmDir, sq8Door, sq8Dir)
    val ids = allowed.map(a =>
      a.select(col(a.columns.head).as("doc_id")))
    val lex = rankLex(ids.fold(
      Bm25Index.search(bmView, bmStats.get, qTerms, legK, nBuckets))(a =>
      Bm25Index.searchFiltered(bmView, bmStats.get, qTerms, legK,
        nBuckets, a)))
    val vec = Similarity.sq8TopKIndexedPruned(queryVecs, sq8View, cents,
      legK, nprobe, ids)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0, weights)
  }

  /** The BATCHED SQ8-tier hybrid: B queries, one union-of-buckets
    * lexical pass, one union-of-probed-cells int8-cosine pass, fusion
    * per qid — [[hybridFromStoresBatch]]'s shape on the quantized
    * store. */
  def hybridFromStoresSq8Batch(spark: org.apache.spark.sql.SparkSession,
                               bmDoor: Maintenance.Door, bmDir: String,
                               nBuckets: Int,
                               sq8Door: Maintenance.Door, sq8Dir: String,
                               cents: Seq[(Long, Array[Double])],
                               queryVecs: DataFrame,
                               queries: Seq[(Long, Seq[String])], k: Int,
                               legK: Int = 20, nprobe: Int = 4,
                               k0: Int = 60,
                               weights: Seq[Long] = Nil,
                               allowed: Option[DataFrame] = None)
      : DataFrame = {
    val (bmView, bmStats, sq8View) =
      sq8StoreViews(spark, bmDoor, bmDir, sq8Door, sq8Dir)
    val lex = allowed.fold(
      Bm25Index.searchBatch(bmView, bmStats.get, queries, legK,
        nBuckets))(a =>
      Bm25Index.searchBatchFiltered(bmView, bmStats.get, queries, legK,
        nBuckets, a))
      .select(col("qid"), col("doc_id"), col("rank"))
    val vec = Similarity.sq8TopKIndexedPruned(queryVecs, sq8View, cents,
      legK, nprobe, allowed)
      .select(col("qid"), col("nid").as("doc_id"), col("rank"))
    rrfFuseByQuery(Seq(lex, vec), k, k0, weights)
  }

  /** [[hybridFromStoresSq8]]'s scalar twin — no guard job, no
    * cell-resolution job ([[Similarity.sq8TopKIndexedScalar]]). */
  def hybridFromStoresSq8Scalar(spark: org.apache.spark.sql.SparkSession,
                                bmDoor: Maintenance.Door, bmDir: String,
                                nBuckets: Int,
                                sq8Door: Maintenance.Door, sq8Dir: String,
                                cents: Seq[(Long, Array[Double])],
                                query: (Long, Seq[Double]),
                                qTerms: Seq[String],
                                k: Int, legK: Int = 20, nprobe: Int = 4,
                                k0: Int = 60,
                                weights: Seq[Long] = Nil,
                                allowed: Option[DataFrame] = None)
      : DataFrame = {
    val (bmView, bmStats, sq8View) =
      sq8StoreViews(spark, bmDoor, bmDir, sq8Door, sq8Dir)
    val ids = allowed.map(a =>
      a.select(col(a.columns.head).as("doc_id")))
    val lex = rankLex(ids.fold(
      Bm25Index.search(bmView, bmStats.get, qTerms, legK, nBuckets))(a =>
      Bm25Index.searchFiltered(bmView, bmStats.get, qTerms, legK,
        nBuckets, a)))
    val vec = Similarity.sq8TopKIndexedScalar(query._1, query._2,
      sq8View, cents, legK, nprobe, ids)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0, weights)
  }

  private def sq8StoreViews(spark: org.apache.spark.sql.SparkSession,
                            bmDoor: Maintenance.Door, bmDir: String,
                            sq8Door: Maintenance.Door, sq8Dir: String)
      : (DataFrame, Option[DataFrame], DataFrame) = {
    import graft.streaming.IndexMaintenanceStream
    val asOf = math.min(
      IndexMaintenanceStream.committedBatch(spark, bmDir),
      IndexMaintenanceStream.committedBatch(spark, sq8Dir))
    val (bmView, bmStats) =
      IndexMaintenanceStream.viewAt(spark, bmDoor, bmDir, asOf)
    val (sq8View, _) =
      IndexMaintenanceStream.viewAt(spark, sq8Door, sq8Dir, asOf)
    (bmView, bmStats, sq8View)
  }

  /** The ADAPTIVE-TIER hybrid — the margin router serving the fused
    * ranker from THREE stores at one min-committed batch: the vector
    * leg probes the SQ8 store and routes only margin-uncertain
    * queries' candidates through the exact tail funded by the
    * FULL-VECTOR store ([[Similarity.sq8TopKIndexedAdaptiveRerank]]),
    * so the deployment's full-vector bytes scale with the query mix's
    * actual cut-line uncertainty (read `marginPpm` off the
    * [[Similarity.sq8CutMargins]] census). The min-committed rule
    * covers the refetch: the int8 ranking and the exact tail can
    * never mix corpus versions. At marginPpm = 0 this serves exactly
    * [[hybridFromStoresSq8]]; at a covering margin it is the SQ8 tier
    * with the full tail. */
  def hybridFromStoresSq8Adaptive(spark: org.apache.spark.sql.SparkSession,
                                  bmDoor: Maintenance.Door, bmDir: String,
                                  nBuckets: Int,
                                  sq8Door: Maintenance.Door,
                                  sq8Dir: String,
                                  cents: Seq[(Long, Array[Double])],
                                  vecDoor: Maintenance.Door,
                                  vecDir: String,
                                  queryVecs: DataFrame,
                                  qTerms: Seq[String],
                                  k: Int, legK: Int = 20,
                                  nprobe: Int = 4, rerankC: Int = 100,
                                  marginPpm: Long = 0L, k0: Int = 60,
                                  weights: Seq[Long] = Nil,
                                  allowed: Option[DataFrame] = None)
      : DataFrame = {
    requireSingleQuery(queryVecs)
    val (bmView, bmStats, sq8View, vectors) =
      sq8AdaptiveStoreViews(spark, bmDoor, bmDir, sq8Door, sq8Dir,
        vecDoor, vecDir)
    val ids = allowed.map(a =>
      a.select(col(a.columns.head).as("doc_id")))
    val lex = rankLex(ids.fold(
      Bm25Index.search(bmView, bmStats.get, qTerms, legK, nBuckets))(a =>
      Bm25Index.searchFiltered(bmView, bmStats.get, qTerms, legK,
        nBuckets, a)))
    val vec = Similarity.sq8TopKIndexedAdaptiveRerank(queryVecs,
      sq8View, cents, legK, nprobe, rerankC, marginPpm, vectors, ids)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0, weights)
  }

  /** Resolve the adaptive tier's three stores (BM25 postings, SQ8
    * codes, full vectors) at ONE committed batch, shaping the
    * full-vector view as the cell-carrying side table the adaptive
    * tail's cell-pruned refetch takes. */
  private def sq8AdaptiveStoreViews(
      spark: org.apache.spark.sql.SparkSession,
      bmDoor: Maintenance.Door, bmDir: String,
      sq8Door: Maintenance.Door, sq8Dir: String,
      vecDoor: Maintenance.Door, vecDir: String)
      : (DataFrame, Option[DataFrame], DataFrame, DataFrame) = {
    import graft.streaming.IndexMaintenanceStream
    val asOf = Seq(bmDir, sq8Dir, vecDir)
      .map(IndexMaintenanceStream.committedBatch(spark, _)).min
    val (bmView, bmStats) =
      IndexMaintenanceStream.viewAt(spark, bmDoor, bmDir, asOf)
    val (sq8View, _) =
      IndexMaintenanceStream.viewAt(spark, sq8Door, sq8Dir, asOf)
    val (vecView, _) =
      IndexMaintenanceStream.viewAt(spark, vecDoor, vecDir, asOf)
    (bmView, bmStats, sq8View,
      vecView.select(col("cell"), col("nid"), col("ne")))
  }

  /** Resolve the three code-tier stores (BM25 postings, PQ codes, full
    * vectors) at ONE committed batch — min over the three pointers, the
    * [[hybridFromStores]] consistency rule extended to the rerank
    * refetch — and shape the full-vector view as the `(nid, ne)` side
    * table the rerank tail takes. */
  private def pqStoreViews(spark: org.apache.spark.sql.SparkSession,
                           bmDoor: Maintenance.Door, bmDir: String,
                           pqDoor: Maintenance.Door, pqDir: String,
                           vecDoor: Maintenance.Door, vecDir: String)
      : (DataFrame, Option[DataFrame], DataFrame, DataFrame) = {
    import graft.streaming.IndexMaintenanceStream
    val asOf = Seq(bmDir, pqDir, vecDir)
      .map(IndexMaintenanceStream.committedBatch(spark, _)).min
    val (bmView, bmStats) =
      IndexMaintenanceStream.viewAt(spark, bmDoor, bmDir, asOf)
    val (pqView, _) =
      IndexMaintenanceStream.viewAt(spark, pqDoor, pqDir, asOf)
    val (vecView, _) =
      IndexMaintenanceStream.viewAt(spark, vecDoor, vecDir, asOf)
    // the cell column rides along: the rerank tail pushes its literal
    // probe-cell filter into the refetch scan too (both stores assign
    // under the same frozen quantizer, so every candidate's current
    // vector lives in a probed cell — Similarity.pruneVectors)
    (bmView, bmStats, pqView,
      vecView.select(col("cell"), col("nid"), col("ne")))
  }

  /** RETRIEVAL EVALUATION — the harness that closes the loop on every
    * ranker above: per-query IR metrics of a ranked result set against
    * a relevance table (qrels). Metrics are INTEGER-EXACT (ppm via
    * bigint `div`), so the whole evaluation mirrors in ANSI SQL for
    * the DuckDB oracle — no float log/division to drift on:
    *
    *  - `hits`        relevant results at rank ≤ k
    *  - `recall_ppm`  hits · 1e6 div n_rel
    *  - `mrr_ppm`     1e6 div (rank of the first hit)   (0 if none)
    *  - `ap_ppm`      Σ_{i-th hit at rank r} (i·1e6 div r) div n_rel
    *                  — average precision, the AP@k with the
    *                  n_rel denominator
    *
    * Every query in `qrels` appears in the output (zero rows for
    * no-hit queries) — silent query drop is the classic eval bug.
    * Scale shape: one semi-join of the k-bounded results against the
    * qrels (both ranked-result-sized, never corpus-sized), per-qid
    * windows over ≤ k rows; qrels may be corpus-derived but arrives
    * pre-projected to (qid, doc_id). */
  def evalMetrics(results: DataFrame, qrels: DataFrame,
                  k: Int): DataFrame = {
    val rel = qrels.select(col("qid").cast("long").as("qid"),
      col("doc_id").cast("long").as("doc_id")).distinct()
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val hits = results
      .select(col("qid").cast("long").as("qid"),
        col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank"))
      .where(col("rank") <= k)
      .join(rel, Seq("qid", "doc_id"), "left_semi")
    val w = Window.partitionBy(col("qid")).orderBy(col("rank").asc)
    val perHit = hits
      .withColumn("hit_idx", row_number().over(w).cast("long"))
      .select(col("qid"), col("rank"),
        expr("hit_idx * 1000000 div rank").as("prec_ppm"))
    val agg = perHit.groupBy("qid").agg(
      count(lit(1)).as("hits"),
      min(col("rank")).as("first_hit_rank"),
      sum(col("prec_ppm")).as("sum_prec_ppm"))
    nRel.join(agg, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr("coalesce(hits, 0) * 1000000 div n_rel").as("recall_ppm"),
        coalesce(expr("1000000 div first_hit_rank"), lit(0L))
          .as("mrr_ppm"),
        expr("coalesce(sum_prec_ppm, 0) div n_rel").as("ap_ppm"))
  }

  /** Macro average of [[evalMetrics]] over all queries — one row
    * `(n_queries, macro_recall_ppm, macro_mrr_ppm, macro_map_ppm)`,
    * each the integer mean (ppm div) of the per-query values. */
  def evalMacro(perQuery: DataFrame): DataFrame =
    perQuery.agg(count(lit(1)).as("n_queries"),
      expr("sum(recall_ppm) div count(1)").as("macro_recall_ppm"),
      expr("sum(mrr_ppm) div count(1)").as("macro_mrr_ppm"),
      expr("sum(ap_ppm) div count(1)").as("macro_map_ppm"))

  /** PARAMETER-SWEEP harness — the tuning loop [[evalMetrics]] opens,
    * closed: score every fusion variant (per-leg weights × k0) of the
    * SAME ranked legs against one qrels table and rank the variants by
    * macro MAP. The legs are eagerly materialized ONCE (they are
    * leg-k-sized — |queries| × legK rows), so the sweep probes each
    * index exactly once no matter how many variants run; per variant
    * the work is one leg-k-sized fusion plus the qrels-sized metric
    * pass — never an index touch, never per (variant × query)
    * (ScaleBench pins this at 1M). Output: one row per variant
    * `(variant_id, lex_w, vec_w, k0, n_queries, macro_recall_ppm,
    * macro_mrr_ppm, macro_map_ppm)`, best MAP first (ties: lower
    * variant_id), integer-exact end to end so the whole sweep mirrors
    * in ANSI SQL.
    *
    * `variants` = (variant_id, (lexWeightPpm, vecWeightPpm), k0);
    * `legs` = (lexical, vector) ranked `(qid, doc_id, rank)` frames,
    * the exact shapes [[Bm25Index.searchBatch]] /
    * [[Similarity.ivfTopKIndexed]] emit. */
  def evalSweep(lexLeg: DataFrame, vecLeg: DataFrame,
                variants: Seq[(Long, (Long, Long), Int)],
                k: Int, qrels: DataFrame, evalK: Int): DataFrame = {
    require(variants.nonEmpty, "evalSweep needs at least one variant")
    val lex = Dedup.checkpointCorpus(
      lexLeg.select(col("qid"), col("doc_id"), col("rank")))
    val vec = Dedup.checkpointCorpus(
      vecLeg.select(col("qid"), col("doc_id"), col("rank")))
    val rows = variants.map { case (vid, (wl, wv), k0) =>
      val fused = rrfFuseByQuery(Seq(lex, vec), k, k0, Seq(wl, wv))
      evalMacro(evalMetrics(
        fused.select(col("qid"), col("doc_id"), col("rank")),
        qrels, evalK))
        .select(lit(vid).as("variant_id"), lit(wl).as("lex_w"),
          lit(wv).as("vec_w"), lit(k0.toLong).as("k0"),
          col("n_queries"), col("macro_recall_ppm"),
          col("macro_mrr_ppm"), col("macro_map_ppm"))
    }
    rows.reduce(_ unionByName _)
      .orderBy(col("macro_map_ppm").desc, col("variant_id").asc)
  }

  /** The ANN-side tuning loop — [[evalSweep]]'s twin for the knob the
    * PQ/IVF recall ledgers expose: score the partition-pruned IVF
    * probe at each `nprobe` variant against an EXACT reference top-k
    * (`exact` = `(qid, nid)` rows, e.g. [[Similarity.bruteForceTopK]]
    * output on a held-out query sample) and rank the accuracy curve.
    * One row per variant `(nprobe, n_queries, macro_recall_ppm,
    * macro_mrr_ppm, macro_map_ppm)` ordered by nprobe — the measured
    * recall-vs-cost curve a deployment reads the operating point off.
    * Cost shape: the reference is materialized ONCE (query-sample ×
    * k rows); each variant pays exactly one pruned probe (≤
    * |queries|·nprobe of the nlist cell partitions — nprobe IS the
    * cost being swept, so per-variant index work is the measurement,
    * not overhead) plus a qrels-sized metric pass. Integer-exact end
    * to end, so the whole sweep mirrors in ANSI SQL. */
  def annRecallSweep(queries: DataFrame, index: DataFrame,
                     cents: Seq[(Long, Array[Double])],
                     nprobes: Seq[Int], k: Int,
                     exact: DataFrame): DataFrame = {
    require(nprobes.nonEmpty, "annRecallSweep needs at least one variant")
    val qrels = Dedup.checkpointCorpus(
      exact.select(col("qid"), col("nid").as("doc_id")))
    nprobes.map { np =>
      val res = Similarity.ivfTopKIndexedPruned(queries, index, cents,
        k, np)
        .select(col("qid"), col("nid").as("doc_id"), col("rank"))
      evalMacro(evalMetrics(res, qrels, k))
        .select(lit(np.toLong).as("nprobe"), col("n_queries"),
          col("macro_recall_ppm"), col("macro_mrr_ppm"),
          col("macro_map_ppm"))
    }.reduce(_ unionByName _).orderBy(col("nprobe").asc)
  }

  /** [[annRecallSweep]] extended to the CODE-store serving probe — the
    * operating surface of the memory-bounded tier is TWO-dimensional
    * (`nprobe` = cells scanned, `rerankC` = full-vector bytes touched
    * by the exact tail), so the grid sweeps both: each point runs
    * [[Similarity.ivfPqTopKIndexedPrunedRerank]] over the persisted PQ
    * code index at that (nprobe, rerankC) and scores it against the
    * exact reference. Per-point cost IS the operating point being
    * measured: ≤ |queries|·nprobe cell partitions ADC-scanned +
    * queries × rerankC full-vector refetches; the reference
    * materializes once. Output `(nprobe, rerank_c, n_queries,
    * macro_recall_ppm, macro_mrr_ppm, macro_map_ppm)` ordered by
    * (nprobe, rerank_c) — the measured recall-vs-bytes-vs-cost curve a
    * deployment reads its knobs off. Integer-exact end to end. */
  def annPqRecallSweep(queries: DataFrame, index: DataFrame,
                       cents: Seq[(Long, Array[Double])],
                       cbs: Array[Array[Array[Double]]],
                       grid: Seq[(Int, Int)], k: Int,
                       exact: DataFrame, vectors: DataFrame): DataFrame = {
    require(grid.nonEmpty, "annPqRecallSweep needs at least one point")
    val qrels = Dedup.checkpointCorpus(
      exact.select(col("qid"), col("nid").as("doc_id")))
    grid.map { case (np, rc) =>
      val res = Similarity.ivfPqTopKIndexedPrunedRerank(queries, index,
        cents, cbs, k, np, rc, vectors)
        .select(col("qid"), col("nid").as("doc_id"), col("rank"))
      evalMacro(evalMetrics(res, qrels, k))
        .select(lit(np.toLong).as("nprobe"), lit(rc.toLong).as("rerank_c"),
          col("n_queries"), col("macro_recall_ppm"),
          col("macro_mrr_ppm"), col("macro_map_ppm"))
    }.reduce(_ unionByName _)
      .orderBy(col("nprobe").asc, col("rerank_c").asc)
  }

  /** [[annRecallSweep]] on the SQ8 tier — the middle tier's own
    * recall-vs-cost curve, completing the per-tier set (IVF 1-D grid,
    * PQ 2-D grid, SQ8 here): each nprobe variant runs the pruned int8
    * probe ([[Similarity.sq8TopKIndexedPruned]]) over the persisted
    * quantized index and scores against the exact reference; `rerank`
    * threads the optional exact tail through every variant, so the
    * same sweep measures the tail's recall payback where the
    * clustered-fixture ledger says int8 rounding reorders the cut
    * line. One row per nprobe, integer-exact end to end; per-variant
    * index work IS the operating point being measured. */
  def annSq8RecallSweep(queries: DataFrame, index: DataFrame,
                        cents: Seq[(Long, Array[Double])],
                        nprobes: Seq[Int], k: Int,
                        exact: DataFrame,
                        rerank: Option[(Int, DataFrame)] = None)
      : DataFrame = {
    require(nprobes.nonEmpty,
      "annSq8RecallSweep needs at least one variant")
    val qrels = Dedup.checkpointCorpus(
      exact.select(col("qid"), col("nid").as("doc_id")))
    nprobes.map { np =>
      val res = Similarity.sq8TopKIndexedPruned(queries, index, cents,
        k, np, rerank = rerank)
        .select(col("qid"), col("nid").as("doc_id"), col("rank"))
      evalMacro(evalMetrics(res, qrels, k))
        .select(lit(np.toLong).as("nprobe"), col("n_queries"),
          col("macro_recall_ppm"), col("macro_mrr_ppm"),
          col("macro_map_ppm"))
    }.reduce(_ unionByName _).orderBy(col("nprobe").asc)
  }

  /** METADATA-FILTERED hybrid — the "search within a slice" query every
    * retrieval deployment serves (language = en, date range, source
    * domain): `allowed` (first column = allowed doc ids, e.g.
    * `docs.where(pred).select("doc_id")`) masks BOTH legs' candidate
    * pools before their top-k limits, so the fused answer is the true
    * hybrid top-k over the slice. Scoring semantics follow each leg's
    * production convention ([[Bm25Index.searchFiltered]] keeps global
    * df/corpus stats — Lucene filter-query semantics;
    * [[Similarity.ivfTopKIndexedPrunedFiltered]] masks candidates under
    * the frozen quantizer — FAISS IDSelector semantics), so per-doc
    * scores are unchanged by the mask and the filter costs
    * probe-sized ⋈ allowed on each leg, never a corpus rescan. */
  def hybridTopKIndexedFiltered(postings: DataFrame, stats: DataFrame,
                                nBuckets: Int, ivfIndex: DataFrame,
                                cents: Seq[(Long, Array[Double])],
                                queryVec: DataFrame,
                                qTerms: Seq[String],
                                allowed: DataFrame,
                                k: Int, legK: Int = 20, nprobe: Int = 4,
                                k0: Int = 60,
                                weights: Seq[Long] = Nil): DataFrame = {
    requireSingleQuery(queryVec)
    val ids = allowed.select(col(allowed.columns.head).as("doc_id"))
    val lex = rankLex(Bm25Index.searchFiltered(postings, stats, qTerms,
      legK, nBuckets, ids))
    val vec = Similarity.ivfTopKIndexedPrunedFiltered(queryVec, ivfIndex,
      cents, legK, nprobe, ids)
      .select(col("nid").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, k0, weights)
  }
}
