package graft

import org.apache.spark.sql.functions._

/** Scale-stress bench for the dedup / similarity families beyond the
  * driver fixtures (5k docs / 500 vectors): synthesizes a deterministic
  * corpus with PLANTED near-duplicates and a deterministic embedding set,
  * then times the core pipeline operators and checks the plants are found.
  *
  * `sbt "runMain graft.ScaleBench <nDocs> <nVecs>"` (defaults 100k / 100k).
  * Measured at 100k docs / 100k × 64-dim vectors, local[32] — see
  * SCALING.md for the recorded numbers.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val nVecs = args.drop(1).headOption.map(_.toInt).getOrElse(100000)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(2000000).selectExpr("sum(id * 2)").collect()

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALEBENCH $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    // --- corpus: ~40-token docs from a power-law-ish vocab; every 100th
    // doc is a near-duplicate of its predecessor (one token changed) ---
    val words = expr(
      """transform(sequence(0, 39), j ->
           concat('w', pmod(xxhash64(id * 40 + j) % (1 + pmod(xxhash64(id, j), 3000)), 3000)))""")
    val base = spark.range(nDocs)
      .select(col("id").as("doc_id"), array_join(words, " ").as("text0"))
    val docs = base.select(col("doc_id"),
      when(col("doc_id") % 100 === 99,
        // near-dup of previous doc: same text modulo one planted token
        concat(lag_text, lit(" plantedtoken")))
        .otherwise(col("text0")).as("text"))
      .localCheckpoint(true)

    t("corpus_count") { docs.count() }
    t("minhash_candidates") {
      pipeline.Dedup.minhashCandidates(docs, "doc_id", col("text"))
        .where(col("est_jaccard_ppm") >= 500000).count()
    }
    t("dedup_corpus_end_to_end") {
      pipeline.Dedup.dedupCorpus(docs, "doc_id", col("text")).count()
    }
    t("simhash_pairs") {
      pipeline.Dedup.simhashPairs(docs, "doc_id", col("text")).count()
    }

    // --- embeddings: deterministic 64-dim vectors ---
    val emb = spark.range(nVecs)
      .select(col("id").as("vec_id"), expr(
        """transform(sequence(0, 63), j ->
             cast(pmod(xxhash64(id, j), 2000) as float) / 1000.0 - 1.0)""")
        .cast("array<float>").as("embedding"))
      .localCheckpoint(true)
    val queries = emb.where(col("vec_id") < 10)

    t("vec_count") { emb.count() }
    t("ivf_assign_nlist256") {
      val cents = pipeline.Similarity.centroids(emb, 256)
      pipeline.Similarity.ivfAssign(emb, cents).count()
    }
    t("ivf_top10_nlist256_nprobe8") {
      pipeline.Similarity.ivfTopK(queries, emb, 10, nlist = 256, nprobe = 8).count()
    }
    t("lsh_top10_banded") {
      pipeline.Similarity.lshTopK(queries, emb, 10, planes = 12, bands = 4).count()
    }
    t("near_dup_pairs") {
      pipeline.Similarity.cosineNearDupPairs(emb, 900000L,
        planes = 14, bands = 4).count()
    }
    t("quantize_int8") { pipeline.Similarity.quantizeInt8(emb).count() }
    spark.stop()
  }

  /** Previous row's text without a window-over-everything: doc i pairs
    * with doc i−1 via an equi-join on id (deterministic, shuffle-bounded). */
  private def lag_text = {
    // correlated lookup expressed as a join is overkill for a bench
    // generator — the duplicate pairs only need SOME shared source, so
    // reuse the deterministic text of doc_id - 1 by regenerating it
    expr(
      """array_join(transform(sequence(0, 39), j ->
           concat('w', pmod(xxhash64((doc_id - 1) * 40 + j) % (1 + pmod(xxhash64(doc_id - 1, j), 3000)), 3000))), ' ')""")
  }
}
