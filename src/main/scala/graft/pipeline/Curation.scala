package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators: reproducible splits/samples and benchmark
  * decontamination — the selection steps between raw corpus and training
  * set.
  *
  * All randomness is the portable content hash ([[Dedup.portableHash]] of
  * the id rendered as a string), so samples and splits are deterministic
  * across runs, engines and cluster sizes (no RNG state, no partition
  * dependence) — and every census below is oracle-checkable in SQL.
  */
object Curation {

  /** Uniform bucket in [0, 100) from the id — the split/sample die. */
  def pctBucket(idCol: Column): Column =
    pmod(Dedup.portableHash(idCol.cast("string")), lit(100L))

  /** Deterministic train/val/test assignment: first `trainPct` buckets →
    * train, next `valPct` → val, rest → test. */
  def withSplit(df: DataFrame, idCol: Column,
                trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("split",
      when(pctBucket(idCol) < trainPct, "train")
        .when(pctBucket(idCol) < trainPct + valPct, "val")
        .otherwise("test"))

  /** Reproducible `pct`-percent sample — same rows every run, any engine. */
  def deterministicSample(df: DataFrame, idCol: Column, pct: Int): DataFrame =
    df.where(pctBucket(idCol) < pct)

  /** Ids of training docs sharing ANY word `n`-gram with a benchmark set —
    * the standard n-gram decontamination test (overlap with eval data
    * leaks answers into training). Shape: explode both sides' shingles,
    * semi-join train against the (small) benchmark shingle set on the
    * 8-byte hash — linear, no pairs materialized. */
  def contaminatedIds(train: DataFrame, bench: DataFrame, idCol: String,
                      text: Column, n: Int): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol), explode(Dedup.shingles(text, n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("gh"))
    grams(train)
      .join(grams(bench).select(col("gh")).distinct(), Seq("gh"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Training set minus contaminated docs. */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
                    text: Column, n: Int): DataFrame =
    train.join(contaminatedIds(train, bench, idCol, text, n),
      Seq(idCol), "left_anti")

  // ---- repeated-n-gram (exact substring) dedup census ----

  /** Per-document repeated-n-gram stats — the word-level analog of exact
    * substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): for each doc, how many of its distinct word
    * `n`-grams also occur in at least one OTHER document.
    *
    * Shape at scale: explode distinct shingles (linear), one hash-agg for
    * per-gram doc counts, one hash-join back — both keyed on the 8-byte
    * gram hash, so only (id, hash) tuples shuffle. No pairs materialize:
    * unlike [[Dedup.jaccardPairs]] this never forms (docA, docB), so it
    * stays linear even when thousands of docs share a boilerplate gram. */
  def repeatedNgramStats(df: DataFrame, idCol: String, text: Column,
                         n: Int): DataFrame = {
    val ex = Dedup.checkpointCorpus(df // feeds the count AND the join-back
      .select(col(idCol).as("did"), explode(Dedup.shingles(text, n)).as("g"))
      .select(col("did"), xxhash64(col("g")).as("gh")))
    val cnt = ex.groupBy("gh").agg(count(lit(1)).as("__nd"))
    ex.join(cnt.hint("shuffle_hash"), Seq("gh"))
      .groupBy(col("did"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_ppm",
        floor(lit(1000000.0) * col("n_dup_grams") / col("n_grams"))
          .cast("long"))
  }

  // ---- CCNet-style quality buckets ----

  /** Head/middle/tail quality terciles per language (the CCNet bucketing:
    * rank docs by a quality score within each language, cut into thirds).
    * Score here is vocabulary diversity (distinct/total tokens, ppm) —
    * integer-exact; ordering ties break on the id so both engines agree.
    * `ntile` distributes per language partition — one shuffle. */
  def qualityTerciles(df: DataFrame, idCol: Column, lang: Column,
                      text: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokens(text)
    val scored = df.select(idCol.as("did"), lang.as("lang"),
      length(text).cast("long").as("n_chars_text"),
      floor(lit(1000000.0) * size(array_distinct(toks)) / size(toks))
        .cast("long").as("score_ppm"))
    val w = Window.partitionBy("lang")
      .orderBy(col("score_ppm").desc, col("did").asc)
    scored.withColumn("bucket",
      element_at(lit(Array("head", "middle", "tail")), ntile(3).over(w)))
  }

  // ---- per-source (domain) caps ----

  /** Deterministic per-source document cap — the C4/web-pipeline rule that
    * no single domain may dominate the corpus. Keeps the `cap` docs with
    * the smallest content-hash rank inside each source (reproducible
    * across engines and cluster sizes), reports the census per source.
    *
    * SKEW-SAFE two-phase rank, never a single per-source sort: a hot
    * domain at 30% of a web corpus is the exact case caps exist for, and
    * a plain `Window.partitionBy(source)` would funnel all its rows
    * through ONE reducer. Phase 1 ranks within (source, salt) — the salt
    * is derived from the content hash, so every partition sort is bounded
    * by n_source/salts; only rows ranked ≤ cap survive (any row in the
    * global per-source top-cap ranks ≤ cap inside its salt too, so no
    * qualifying row is lost — the partial top-k is exact). Phase 2
    * re-ranks the ≤ cap·salts survivors per source — bounded rows per
    * key regardless of corpus size. n_total comes from an ordinary
    * partial-aggregating groupBy, which handles skew natively. */
  def domainCapCensus(df: DataFrame, idCol: Column, sourceCol: Column,
                      cap: Int, salts: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(idCol.as("did"), sourceCol.as("source"))
      .withColumn("__h",
        Dedup.portableHash(concat(lit("cap:"), col("did").cast("string"))))
    val totals = keyed.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    val wSalted = Window.partitionBy("source", "__s")
      .orderBy(col("__h").asc, col("did").asc)
    val survivors = keyed
      .withColumn("__s", pmod(col("__h"), lit(salts.toLong)))
      .withColumn("__rk1", row_number().over(wSalted))
      .where(col("__rk1") <= cap)
    val wFinal = Window.partitionBy("source")
      .orderBy(col("__h").asc, col("did").asc)
    val kept = survivors.withColumn("__rk", row_number().over(wFinal))
      .where(col("__rk") <= cap)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("did")).as("kept_id_sum"))
    // sources with fewer rows than ranks can't drop below the cap, so the
    // left join only fills genuinely kept counts; a source never disappears
    totals.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_id_sum"), lit(0L)).as("kept_id_sum"))
  }

  // ---- sequence packing ----

  /** Pack documents into fixed token-budget bins (pretraining sequence
    * packing). Global order is (bucket, content-hash, id); each doc's bin
    * is `floor(tokens_before_doc / budget)` under that order.
    *
    * The prefix sum is DISTRIBUTED two-phase, not a global window: cumsum
    * runs inside each of `nBuckets` hash-bucket partitions in parallel,
    * then the per-bucket totals (nBuckets rows — bounded, driver-safe)
    * become additive offsets via a running total over the tiny bucket
    * table. A single global `Window.orderBy` would serialize the corpus
    * through one task; this shape holds at any scale. */
  def packBins(df: DataFrame, idCol: Column, text: Column, budget: Long,
               nBuckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = df.select(idCol.as("did"),
        TextAnalysis.tokenCount(text).as("n_tokens"))
      .withColumn("__h",
        Dedup.portableHash(concat(lit("pack:"), col("did").cast("string"))))
      .withColumn("__b", pmod(col("__h"), lit(nBuckets.toLong)))
    val inBucket = Window.partitionBy("__b")
      .orderBy(col("__h").asc, col("did").asc)
    val local = docs.withColumn("__cum",
      sum(col("n_tokens")).over(inBucket) - col("n_tokens"))
    // nBuckets rows: running offset of every earlier bucket's token total
    val offsets = docs.groupBy(col("__b"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__b").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    local.join(broadcast(offsets), Seq("__b"))
      .withColumn("bin",
        floor((col("__cum") + col("__off")) / lit(budget)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("fill_tokens"))
  }

  // ---- token-budget selection ----

  /** Quality-ordered token-budget selection: keep the best documents
    * that fit a total token budget (the "train on the top-N tokens"
    * curation step). Quality here is the distinct-word ratio in ppm
    * (integer-exact; swap any integer score in); the global order is
    * (score desc, id asc) and a doc is kept iff the tokens BEFORE it in
    * that order are under the budget — so exactly one doc may straddle
    * the boundary, and the kept set is a deterministic prefix.
    *
    * The prefix sum is the [[packBins]] two-phase shape, but the
    * buckets must RESPECT the order, not hash it away: bucket =
    * score·nBuckets div (1e6+1) is a contiguous score range, so
    * (bucket desc, in-bucket order) reconstructs the single global
    * order with cumsum running inside every bucket in parallel and the
    * nBuckets-row offset table broadcast. No quantile pass needed —
    * a skewed score distribution only unbalances the in-bucket windows,
    * never the arithmetic. Output: (did, score_ppm, n_tokens,
    * cum_before, kept) — id-keyed and text-free, so the wide corpus
    * columns never ride the window exchanges; join decisions back on
    * id where needed. */
  def tokenBudgetSelect(df: DataFrame, idCol: Column, text: Column,
                        budget: Long, nBuckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = split(text, " ")
    val docs = df.select(idCol.as("did"),
        size(words).cast("long").as("n_tokens"),
        size(array_distinct(words)).cast("long").as("n_distinct"))
      .withColumn("score_ppm",
        expr("cast(n_distinct as decimal(38,0)) * 1000000 div n_tokens")
          .cast("long"))
      .withColumn("__b",
        expr(s"score_ppm * $nBuckets div 1000001"))
    val inBucket = Window.partitionBy("__b")
      .orderBy(col("score_ppm").desc, col("did").asc)
    val local = docs.withColumn("__cum",
      sum(col("n_tokens")).over(inBucket) - col("n_tokens"))
    val offsets = docs.groupBy(col("__b"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__b").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    local.join(broadcast(offsets), Seq("__b"))
      .withColumn("cum_before", col("__cum") + col("__off"))
      .withColumn("kept", col("cum_before") < budget)
      .select(col("did"), col("score_ppm"), col("n_tokens"),
        col("cum_before"), col("kept"))
  }

  // ---- token-window chunking ----

  /** Sliding token windows per document (context-window shaping for
    * training / RAG indexing): one output row per (doc, window start),
    * starts at every `stride` tokens, window capped at `win` tokens and
    * clamped at the document tail. `chunk_hash` is the portable content
    * hash of the re-joined window, so the oracle checks window CONTENT,
    * not just arithmetic.
    *
    * Shape at scale: `sequence` + `explode` inside the row — no shuffle at
    * all until whatever consumes the chunks; output is ~n_tokens/stride
    * rows per doc, linear in corpus size. */
  def chunkTokens(df: DataFrame, idCol: String, text: Column,
                  win: Int, stride: Int): DataFrame =
    df.select(col(idCol).as("did"), TextAnalysis.tokens(text).as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        floor((col("__n") - 1) / lit(stride.toLong)).cast("long"))))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .select(col("did"), col("chunk_idx"), col("start_tok"),
        least(lit(win.toLong), col("__n") - col("start_tok"))
          .as("n_tok_chunk"),
        Dedup.portableHash(array_join(
          slice(col("__t"), (col("start_tok") + 1).cast("int"), lit(win)),
          " ")).as("chunk_hash"))

  // ---- corpus mixture planning ----

  /** Source-mixture plan: given target corpus shares per language (ppm),
    * find the largest total token budget S the corpus supports WITHOUT
    * upsampling any language — S = min over langs of tokens_l / share_l —
    * then each language contributes keep_l = share_l · S tokens at
    * sampling rate keep_l / tokens_l. The standard mixture-reweighting
    * step (e.g. The Pile / ROOTS recipes) run as pure aggregation.
    *
    * Integer-exact end to end: DIV (truncated = floor on nonnegative)
    * mirrors DuckDB `//`; at extreme token counts (>9e12) the 1e6
    * multiplies need DECIMAL(38,0) — swap noted, shape unchanged.
    * Languages absent from `targetsPpm` are excluded (inner join). */
  def mixturePlan(df: DataFrame, langCol: Column, text: Column,
                  targetsPpm: Map[String, Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val totals = df.groupBy(langCol.as("lang"))
      .agg(sum(TextAnalysis.tokenCount(text)).as("tokens"))
    val tgt = targetsPpm.toSeq.sortBy(_._1).toDF("lang", "target_ppm")
    val joined = totals.join(broadcast(tgt), Seq("lang"))
    val s = joined.agg(min(
      expr("CAST((1000000 * tokens) DIV target_ppm AS BIGINT)")).as("__S"))
    joined.crossJoin(s) // scalar combine
      .withColumn("keep_tokens",
        expr("CAST((target_ppm * __S) DIV 1000000 AS BIGINT)"))
      .select(col("lang"), col("tokens"), col("target_ppm"),
        col("keep_tokens"),
        expr("CAST((1000000 * keep_tokens) DIV tokens AS BIGINT)")
          .as("rate_ppm"))
  }

  // ---- Bloom-prefiltered decontamination (the 100 TB shape) ----

  /** Bloom bit array (k = 2) over the benchmark grams' portable hashes,
    * built driver-side — the bench side of decontamination is an eval
    * set, bounded by construction (guarded below). Positions are
    * `h mod m` and `(h div m) mod m` of the 60-bit portable hash —
    * integer arithmetic both engines reproduce. */
  val BloomBits = 1 << 16

  /** Bits for a bench set of `nHashes` grams: smallest power of two ≥
    * 16× the gram count (k=2 false-positive rate ~0.5% at that load),
    * clamped to [2^16, 2^27] (16 MB of plan literal at the top — still a
    * constant, never a join). A saturated bloom filters nothing; sizing
    * off the actual bench set keeps the prefilter selective at any
    * eval-set size the 4M-gram guard admits. */
  def bloomSize(nHashes: Int): Int = {
    var m = BloomBits
    while (m.toLong < 16L * nHashes && m < (1 << 27)) m <<= 1
    m
  }

  def bloomWords(benchGramHashes: Array[Long],
                 mBits: Int = BloomBits): Array[Long] = {
    require(Integer.bitCount(mBits) == 1, s"bloom bits must be a power of two: $mBits")
    val words = new Array[Long](mBits / 64)
    benchGramHashes.foreach { h =>
      Seq(h % mBits, (h / mBits) % mBits).foreach { p =>
        words((p >> 6).toInt) |= 1L << (p & 63)
      }
    }
    words
  }

  /** Bit-test of the bloom for a hash column — pure built-in expressions
    * (`element_at` on the word-array literal + power-of-two mask), fully
    * codegen'd, zero joins; m is recovered from the literal's length. */
  def bloomMightContain(words: Array[Long], h: Column): Column = {
    val mBits = words.length * 64
    val mShift = java.lang.Integer.numberOfTrailingZeros(mBits)
    val wordsLit = lit(words)
    val powers = lit(Array.tabulate(64)(i => 1L << i))
    // shifts, not `/`: Divide casts longs to double, which drops low bits
    // of a 60-bit hash past 2^53 — shiftright is exact (h is nonnegative)
    def bitSet(p: Column): Column =
      (element_at(wordsLit, shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(element_at(powers, pmod(p, lit(64L)).cast("int") + 1))) =!= 0
    bitSet(pmod(h, lit(mBits.toLong))) &&
      bitSet(pmod(shiftright(h, mShift), lit(mBits.toLong)))
  }

  /** Decontamination with a Bloom prefilter: the exact semi-join of
    * [[contaminatedIds]] shuffles EVERY training gram; here a driver-built
    * bloom over the (bounded) bench grams drops non-candidate grams at the
    * scan — only grams that might match shuffle into the exact verify.
    * False positives are removed by the exact join; false negatives are
    * impossible — the result set is identical to [[contaminatedIds]].
    * Returns (docs with a bloom-candidate gram, exactly contaminated docs)
    * as ("did", "bloom_hit", "contaminated"). */
  def bloomDecontaminationStats(train: DataFrame, bench: DataFrame,
                                idCol: String, text: Column, n: Int,
                                maxBenchGrams: Int = 4000000): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol).as("did"), explode(Dedup.shingles(text, n)).as("g"))
      .select(col("did"), Dedup.portableHash(col("g")).as("gh"))
    val benchHashes = bench
      .select(explode(Dedup.shingles(text, n)).as("g"))
      .select(Dedup.portableHash(col("g")).as("gh")).distinct()
      .limit(maxBenchGrams + 1).collect().map(_.getLong(0))
    require(benchHashes.length <= maxBenchGrams,
      s"bench gram set exceeds $maxBenchGrams — not an eval-sized benchmark")
    // m scales with the ACTUAL bench gram count — a fixed m saturates on
    // large eval sets (every bit set → prefilter admits everything).
    // NOTE the oracle of corpus_decontaminate_bloom mirrors m = 2^16,
    // which holds while its 50-doc bench stays ≤ 4096 distinct grams
    // (~2.5k at every sf — id-based split, corpus-size independent).
    val words = bloomWords(benchHashes, bloomSize(benchHashes.length))
    val cand = grams(train).where(bloomMightContain(words, col("gh")))
      .localCheckpoint(true) // bloom-survivor grams: small, reused twice
    val exact = cand
      .join(grams(bench).select(col("gh")).distinct(), Seq("gh"), "left_semi")
      .select(col("did")).distinct().withColumn("__c", lit(1L))
    cand.select(col("did")).distinct()
      .join(exact, Seq("did"), "left")
      .select(col("did"), lit(1L).as("bloom_hit"),
        coalesce(col("__c"), lit(0L)).as("contaminated"))
  }

  // ---- training-shard export (the pipeline's last mile) ----

  /** Deterministic shard id for a document: portable hash of the id,
    * uniform over `nShards` — stable across engines, cluster sizes and
    * reruns, so a re-export after an upstream fix moves only the docs
    * that actually changed shards (none). */
  def shardId(idCol: Column, nShards: Int): Column =
    pmod(Dedup.portableHash(concat(lit("shard:"), idCol.cast("string"))),
      lit(nShards.toLong))

  /** Per-shard manifest of the would-be export: doc/token/char totals and
    * an id-xor membership pin per shard — the artifact a training job
    * checks before reading, and the oracle-checkable contract of
    * [[writeShards]]. One aggregation, no write. */
  def shardManifest(df: DataFrame, idCol: Column, text: Column,
                    nShards: Int): DataFrame =
    df.select(idCol.as("did"), shardId(idCol, nShards).as("shard"),
        TextAnalysis.tokenCount(text).as("n_tokens"),
        length(text).cast("long").as("n_chars"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        expr("bit_xor(did)").as("id_xor"))

  /** Materialize the corpus as `nShards` training shards: one directory
    * per shard (`shard=K/`), documents in a deterministic hash-shuffled
    * order WITHIN each shard (training wants decorrelated order, and a
    * deterministic shuffle keeps re-exports byte-reproducible). One
    * shuffle (repartition on shard) + a per-partition sort; no global
    * sort.
    *
    * Returns the manifest computed FROM THE WRITTEN FILES, not from the
    * input plan: re-running the (possibly expensive) upstream DAG for the
    * aggregation would double the export's cost, and a manifest derived
    * from a second evaluation describes what a re-execution WOULD write,
    * not what the files on disk contain. `idCol`/`text` must be plain
    * column references of `df` so they resolve against the reload. */
  def writeShards(df: DataFrame, idCol: Column, text: Column,
                  nShards: Int, outDir: String): DataFrame = {
    df.withColumn("shard", shardId(idCol, nShards))
      .withColumn("__ord",
        Dedup.portableHash(concat(lit("order:"), idCol.cast("string"))))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"), idCol)
      .drop("__ord")
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(text)).as("n_tokens"),
        sum(length(text).cast("long")).as("n_chars"),
        expr(s"bit_xor(${idCol.toString})").as("id_xor"))
  }
}
