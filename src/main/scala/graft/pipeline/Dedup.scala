package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: every method is shingle-explode → shuffle-on-key →
  * bounded-bucket pairing. No all-pairs comparison ever happens: candidate
  * pairs only form inside an LSH band bucket / shared-shingle group — the
  * standard web-scale dedup shape (explode ≈ linear in corpus size, bucket
  * joins shuffle on band hash). All expressions are Catalyst higher-order
  * functions: no UDFs, no driver-side loops.
  */
object Dedup {

  /** Word n-gram shingles (distinct) of a text column — compiled
    * ([[graft.functions.NGramShingles]]); identical output to the
    * composable HOF formulation the oracles mirror. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.NGramShingles.ngram_shingles(TextAnalysis.tokens(text), n)

  /** 60-bit portable hashes of the DISTINCT shingles, fully compiled —
    * the value-identical twin of `portableHash(explode(shingles(…)))`:
    * `array_distinct` over [[graft.functions.NGramHashes]]' positional
    * hashes equals hashing the distinct shingle strings (identical
    * strings hash identically — md5 over the same space-joined bytes),
    * and the short-text branch hashes the whole token join exactly like
    * `shingles()`' fallback. Kills the per-shingle md5→hex→substring→
    * radix-parse chain that made signature computation the minhash
    * pipeline's hot loop (the corpus-sized explode evaluates it once per
    * shingle × document). */
  def shingleHashes(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    // NULL text must yield NULL (doc dropped by the downstream explode),
    // not [null]: a bare otherwise() would emit array(portableHash(null))
    // = [null], putting every null-text doc into the signature table with
    // an all-null signature — they'd pairwise collide in every LSH band
    // (k nulls → k²/2 candidate pairs, the hot-bucket hazard) and diverge
    // from the oracle, whose UNNEST drops them.
    when(size(toks) >= n,
      array_distinct(graft.functions.NGramHashes.ngram_hashes(toks, n)))
      .when(toks.isNotNull, array(portableHash(array_join(toks, " "))))
  }

  /** Exact duplicate groups by content hash: (fingerprint, n_copies, keeper). */
  def exactGroups(df: DataFrame, text: Column, idCol: Column): DataFrame =
    df.groupBy(md5(text).as("fingerprint"))
      .agg(count(lit(1)).as("n_copies"), min(idCol).as("keeper"))

  /** N-gram Jaccard near-dup pairs: explode shingles, join on shingle,
    * count common, jaccard = |∩| / (|A|+|B|−|∩|) ≥ threshold.
    * Pairs are (ida < idb); jaccard emitted in ppm (integer-exact). */
  def jaccardPairs(df: DataFrame, idCol: String, text: Column, n: Int,
                   thresholdPpm: Long): DataFrame = {
    val sh = df.select(col(idCol).as("did"), shingles(text, n).as("sh"))
      .withColumn("nsh", size(col("sh")).cast("long"))
    // join on the 8-byte shingle hash, not the string: smaller shuffle,
    // cheaper compares (collision odds ~|shingles|²/2⁶⁴ — negligible)
    // checkpoint: the exploded table feeds the frequency filter AND both
    // sides of the self-join — one computation, not four
    val ex = checkpointCorpus(sh.select(col("did"), col("nsh"),
      explode(col("sh")).as("shingle"))
      .select(col("did"), col("nsh"), xxhash64(col("shingle")).as("shingle_h")))
    // a shingle held by one doc can't form a pair; on real corpora most
    // shingles are unique, so the filter shrinks the self-join input by
    // the long tail (semantics unchanged — unique shingles yield no pairs)
    val shared = ex.groupBy("shingle_h").agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1).select("shingle_h")
    // SHUFFLE_HASH on every corpus-derived join side: upstream stats can
    // lie small (checkpointed RDDs report no size), and a broadcast of a
    // corpus-sized table is never the right plan here — the hint takes
    // precedence over the size-estimate decision
    val exs = ex.join(shared.hint("shuffle_hash"), Seq("shingle_h"), "left_semi")
    val a = exs.select(col("did").as("ida"), col("nsh").as("na"), col("shingle_h"))
    val b = exs.select(col("did").as("idb"), col("nsh").as("nb"), col("shingle_h"))
    a.join(b.hint("shuffle_hash"), Seq("shingle_h"))
      .where(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard_ppm",
        floor(lit(1000000.0) * col("common") /
          (col("na") + col("nb") - col("common"))).cast("long"))
      .where(col("jaccard_ppm") >= thresholdPpm)
      .select("ida", "idb", "jaccard_ppm")
  }

  /** Mersenne prime 2³¹−1: the universal-hash modulus for permutations. */
  val HashP: Long = 2147483647L

  /** Portable 60-bit string hash: the first 15 hex chars of md5, parsed as
    * an integer. Engine-independent (DuckDB: `('0x' || substr(md5(s),1,15))
    * ::BIGINT`), so every hash-derived result — signatures, band buckets,
    * simhashes — is oracle-checkable end to end. ~2× the cost of xxhash64
    * per shingle, but hashed ONCE per shingle: permutations derive from
    * affine remixes below, which are cheaper than the per-permutation
    * re-hash they replace. */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Eager lineage-truncating checkpoint for CORPUS-SIZED intermediates
    * (exploded shingles/grams, signature tables): MEMORY_AND_DISK_SER,
    * not the default deserialized MEMORY_AND_DISK — deserialized row
    * objects are ~5× the serialized bytes, and a corpus-sized cache at
    * that inflation OOMs executors long before the operator itself would
    * (observed: 1M-doc repeated-n-gram census with 36M exploded grams
    * heap-OOMed under the default level; DISK_ONLY avoids the OOM too
    * but pays a full disk round-trip even when the table fits — 2× on
    * the 1M minhash probe). Serialized-in-memory keeps fixture-scale
    * reuse at memory speed and degrades to spill, not failure, at scale.
    * Bounded/small reuse tables (bloom survivors, fixpoint labels) keep
    * the default level.
    *
    * FAULT-TOLERANCE regimes (localCheckpoint blocks lineage recompute —
    * on a real cluster a lost executor kills a multi-hour job mid-pipeline):
    *   - default: executor-local (fast, interactive; a lost executor is
    *     fatal to the query, acceptable for interactive/short runs);
    *   - `spark.graft.reliableCheckpoint=true` (requires
    *     `SparkContext.setCheckpointDir` on durable storage): a reliable
    *     `checkpoint()` — intermediates survive executor loss, at the cost
    *     of one write+read round-trip through the checkpoint filesystem.
    *     The right mode for multi-hour production dedup over 100 TB. */
  def checkpointCorpus(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf
      .getOption("spark.graft.reliableCheckpoint").exists(_.toBoolean)
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        "spark.graft.reliableCheckpoint=true requires " +
          "SparkContext.setCheckpointDir (durable storage)")
      df.checkpoint(eager = true)
    } else
      df.localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
  }

  /** Exact duplicated-SPAN stats per document — the position-aware form
    * of substring dedup ("Deduplicating Training Data Makes Language
    * Models Better", Lee et al. 2022, arXiv:2107.06499): where the
    * repeated-n-gram census counts how MUCH of a doc is duplicated,
    * this localizes WHERE, as maximal runs of consecutive token
    * positions whose k-gram occurs more than once in the corpus. A run
    * of r consecutive duplicated k-gram positions covers a span of
    * r + k − 1 tokens (the k-gram-anchor approximation of the paper's
    * suffix-array spans: every token of the span lies inside some
    * corpus-duplicated k-gram).
    *
    * Returns per doc: `n_grams` (k-gram positions), `n_dup_grams`
    * (duplicated positions), `longest_dup_span` (tokens),
    * `n_spans` (maximal runs).
    *
    * 100 TB shape: gram hashes are computed IN-ROW (`transform` over a
    * `sequence` of positions — no per-doc window, no shuffle), then the
    * same two hash-keyed corpus shuffles as the census (count by gram
    * hash, semi-join back), then ONE window partitioned by doc for the
    * island detection (`p − row_number()`). Everything linear; the only
    * per-doc state is its duplicated positions.
    */
  def duplicatedSpans(df: DataFrame, idCol: String, text: Column,
                      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // gram hash at 1-based position p, portable md5 form (oracle-mirrored);
    // codegen'd — the composable HOF formulation it replaces bit-for-bit is
    // documented on [[graft.functions.NGramHashes]]
    val base = df
      .select(col(idCol).as("did"), TextAnalysis.tokens(text).as("__toks"))
      .where(size(col("__toks")) >= k)
      .select(col("did"),
        (size(col("__toks")) - (k - 1)).cast("long").as("n_grams"),
        graft.functions.NGramHashes.ngram_hashes(col("__toks"), k).as("__gh"))
    val ex = checkpointCorpus(base
      .select(col("did"), col("n_grams"),
        posexplode(col("__gh")).as(Seq("__p0", "gh")))
      .select(col("did"), col("n_grams"), (col("__p0") + 1).as("p"), col("gh")))
    val dupGrams = ex.groupBy(col("gh")).agg(count(lit(1)).as("__c"))
      .where(col("__c") > 1)
    val dup = ex.join(dupGrams.hint("shuffle_hash"), Seq("gh"), "left_semi")
    val w = Window.partitionBy("did").orderBy("p")
    val spans = dup
      .withColumn("__rid", col("p") - row_number().over(w))
      .groupBy(col("did"), col("__rid"))
      .agg((count(lit(1)) + (k - 1)).as("span_toks"))
    val perDoc = spans.groupBy(col("did"))
      .agg(max("span_toks").as("longest_dup_span"),
        count(lit(1)).as("n_spans"),
        sum(col("span_toks") - (k - 1)).as("n_dup_grams"))
    base.select(col("did"), col("n_grams"))
      .join(perDoc.hint("shuffle_hash"), Seq("did"), "left")
      .select(col("did"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("longest_dup_span"), lit(0L)).as("longest_dup_span"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }

  /** Winnowed fingerprints (Schleimer–Wilkerson–Aiken 2003, the MOSS
    * algorithm): the minimum k-gram hash of every sliding window of `w`
    * consecutive k-gram positions, distinct per doc. Selects ~2/(w+1) of
    * all gram hashes yet GUARANTEES any shared token run of length
    * ≥ w + k − 1 contributes at least one shared fingerprint — the
    * deterministic-coverage alternative to MinHash when the match
    * criterion is "shares a substring at least L tokens long" rather
    * than whole-doc resemblance.
    *
    * Everything up to the distinct is IN-ROW (`transform` + `slice` +
    * `array_min` over the gram-hash array — no window operator, no
    * shuffle): the corpus never moves until the (did, f) pairs, already
    * w-fold sparser than the grams, hit their first aggregation.
    * Returns (did, f) — one row per distinct selected fingerprint. */
  def winnowedFingerprints(df: DataFrame, idCol: String, text: Column,
                           k: Int, w: Int): DataFrame = {
    // gram hashes codegen'd ([[graft.functions.NGramHashes]]); the sliding
    // window-min stays a HOF but now loops over LONGS, not md5 hex strings
    val minW = s"""array_distinct(transform(sequence(1, size(__gh) - $w + 1),
        j -> array_min(slice(__gh, j, $w))))"""
    df.select(col(idCol).as("did"), TextAnalysis.tokens(text).as("__toks"))
      .where(size(col("__toks")) >= k + w - 1)
      .select(col("did"),
        graft.functions.NGramHashes.ngram_hashes(col("__toks"), k).as("__gh"))
      .select(col("did"), explode(expr(minW)).as("f"))
  }

  /** Candidate near-dup pairs from shared winnowed fingerprints: docs
    * sharing ≥ `minShared` fingerprints, with the MOSS boilerplate
    * guard — fingerprints present in more than `maxDf` docs are license
    * headers / templates, not duplication evidence, and are dropped
    * BEFORE the self-join (the guard is what keeps a corpus-wide
    * boilerplate print from exploding into |docs|² candidate pairs).
    * Only (f, did) pairs cross the join — id-sized shuffle rows. */
  def winnowPairs(df: DataFrame, idCol: String, text: Column,
                  k: Int = 5, w: Int = 4,
                  minShared: Long = 2, maxDf: Long = 100): DataFrame = {
    val fp = checkpointCorpus(winnowedFingerprints(df, idCol, text, k, w))
    val keep = fp.groupBy(col("f")).agg(count(lit(1)).as("__df"))
      .where(col("__df") > 1 && col("__df") <= maxDf)
    val shared = fp.join(keep.hint("shuffle_hash"), Seq("f"), "left_semi")
    shared.select(col("f"), col("did").as("ida"))
      .join(shared.select(col("f"), col("did").as("idb")).hint("shuffle_hash"),
        Seq("f"))
      .where(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Permutation `k` of a base hash: `(A_k·h + B_k) mod p` — the classic
    * universal-hash family (integer-exact, SQL-mirrorable). */
  def permute(h0p: Column, k: Int): Column =
    (h0p * lit((k + 1) * 2654435761L % HashP) +
      lit((k + 1) * 40503L % HashP)) % HashP

  /** MinHash signature as one nested-HOF expression — the composable
    * reference formulation (interpreted; [[minhashSignatures]] is the
    * codegen'd production path). signature[k] = min over shingles of
    * permutation k. */
  def minhashSignature(sh: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)), k =>
      array_min(transform(sh, s =>
        ((portableHash(s) % HashP) * (((k + 1) * lit(2654435761L)) % HashP) +
          ((k + 1) * lit(40503L)) % HashP) % HashP)))

  /** MinHash LSH candidate pairs: split the signature into `bands` bands,
    * hash each band, bucket-join; estimate Jaccard as the fraction of equal
    * signature positions (ppm).
    *
    * Join discipline for scale: only (band, hash, id) tuples flow through
    * the bucket self-join, candidate pairs are de-duplicated BEFORE the
    * signatures are joined back (a near-dup pair collides in many bands —
    * carrying signatures through the explosion is what kills banded joins
    * on skewed corpora). Default 64 perms × 8 bands = 8 rows/band: high
    * precision candidate generation on vocab-overlapping corpora; recall
    * at jaccard 0.9 ≈ 99%. Production pipelines would checkpoint the
    * signature table instead of recomputing it on both sides of the
    * pair join. */
  /** Signature table via explode + hash-aggregate: one codegen'd pass
    * computing all `perms` minima, instead of nested higher-order-function
    * lambdas (those are CodegenFallback → interpreted, ~100× slower).
    * Shingle strings are hashed once; permutations derive from the cheap
    * long re-hash xxhash64(h, k). */
  def minhashSignatures(df: DataFrame, idCol: String, text: Column,
                        shingleN: Int, perms: Int): DataFrame = {
    val base = df
      .select(col(idCol).as("did"),
        explode(shingleHashes(text, shingleN)).as("h60"))
      .select(col("did"), (col("h60") % HashP).as("h0p"))
    val mins = (0 until perms).map(k => min(permute(col("h0p"), k)).as(s"m$k"))
    base.groupBy("did").agg(mins.head, mins.tail: _*)
      .select(col("did"), array((0 until perms).map(k => col(s"m$k")): _*).as("sig"))
  }

  /** Banded LSH keys of a (did, sig) signature table: band key = the
    * 60-bit prefix of md5 over the comma-joined band slice (the
    * portableHash construction), as a LONG.
    *
    * The band key never leaves the engine — only EQUALITY of keys
    * matters (equal slices ⟹ equal key; unequal slices collide at
    * ~2⁻⁶⁰, and a spurious collision merely adds a candidate pair that
    * still has to pass the signature-estimate threshold). The long key
    * shrinks the dedup family's dominant shuffle from a 32-char hex
    * string to 8 bytes per row and turns the band self-join's compares
    * into long equality. The oracle mirrors bucketing with the full hex
    * key; the PARTITION of rows into buckets is identical, so every
    * downstream result is unchanged. */
  def bandTable(sig: DataFrame, perms: Int, bands: Int): DataFrame = {
    require(perms % bands == 0, "perms must divide into bands")
    val rows = perms / bands
    sig.select(col("did"),
      explode(array((0 until bands).map(b => struct(lit(b).as("b"),
        portableHash(array_join(slice(col("sig"), b * rows + 1, rows)
          .cast("array<string>"), ",")).as("h"))): _*)).as("band"))
      .select(col("band.b").as("b"), col("band.h").as("h"), col("did"))
  }

  /** Estimated Jaccard (ppm, fraction of equal signature positions) for
    * a (ida, idb) pair frame, joining each side's signature back. */
  private def estimatePairs(pairs: DataFrame, sigA: DataFrame,
                            sigB: DataFrame): DataFrame = {
    val matches = size(filter(
      zip_with(col("siga"), col("sigb"), (x, y) => (x === y).cast("int")),
      v => v === 1))
    pairs
      .join(sigA.select(col("did").as("ida"), col("sig").as("siga"))
        .hint("shuffle_hash"), Seq("ida"))
      .join(sigB.select(col("did").as("idb"), col("sig").as("sigb"))
        .hint("shuffle_hash"), Seq("idb"))
      .withColumn("est_jaccard_ppm",
        floor(lit(1000000.0) * matches / size(col("siga"))).cast("long"))
      .select("ida", "idb", "est_jaccard_ppm")
  }

  /** Candidate pairs (ida < idb, est ppm) from an already-computed
    * signature table — the self-join half of [[minhashCandidates]].
    *
    * `maxBucket > 0` caps each (band, hash) bucket to its `maxBucket`
    * lowest-id members before the self-join — the guard against the
    * quadratic hot-bucket hazard: k exact copies of one boilerplate page
    * put k members in EVERY band bucket and emit k²/2 · bands pairs
    * (100k copies ⇒ 5·10⁹ pairs — a job-killer at web-corpus scale;
    * hyper-duplication IS the common case there: empty pages, error
    * pages, licence stubs). Capping keeps the candidate count per bucket
    * ≤ maxBucket²/2 with a disclosed recall trade: members beyond the cap
    * lose candidacy through that bucket (other bands can still link
    * them), and EXACT duplicates — the only way buckets get hot without
    * near-dup structure — are the linear hash-groupBy [[exactGroups]]
    * path's job, not LSH's. Lowest-id members win so the kept set is
    * deterministic and agrees with the min-label cluster keeper rule.
    * The cap window shares the band table's (b, h) hash partitioning. */
  def candidatesFromSigs(sig: DataFrame, perms: Int,
                         bands: Int, maxBucket: Int = 0): DataFrame = {
    val banded0 = bandTable(sig, perms, bands)
    val banded = if (maxBucket <= 0) banded0 else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("b"), col("h")).orderBy(col("did").asc)
      banded0.withColumn("__rk", row_number().over(w))
        .where(col("__rk") <= maxBucket).drop("__rk")
    }
    val pairs = banded.select(col("b"), col("h"), col("did").as("ida"))
      // shuffle_hash: both sides are the corpus-sized band table (see
      // jaccardPairs — broadcast under lying stats is the hazard)
      .join(banded.select(col("b"), col("h"), col("did").as("idb"))
        .hint("shuffle_hash"), Seq("b", "h"))
      .where(col("ida") < col("idb"))
      .select("ida", "idb")
      .dropDuplicates("ida", "idb")
    estimatePairs(pairs, sig, sig)
  }

  def minhashCandidates(df: DataFrame, idCol: String, text: Column,
                        shingleN: Int = 3, perms: Int = 64,
                        bands: Int = 8, maxBucket: Int = 0): DataFrame = {
    // the signature table feeds three consumers (band keys + both sides of
    // the estimate join-back); checkpoint it so the expensive explode+
    // 64-min aggregation runs ONCE, not per consumer
    val sig = checkpointCorpus(
      minhashSignatures(df, idCol, text, shingleN, perms))
    candidatesFromSigs(sig, perms, bands, maxBucket)
  }

  /** Incremental corpus dedup — the continuous-ingestion shape: dedupe a
    * NEW batch against an already-kept corpus WITHOUT rescanning its
    * documents. The kept corpus is represented only by its MinHash
    * signature table (`keptSigs`: (did, sig) rows, persisted between
    * batches — perms longs per doc, ~0.5 KB, regardless of doc size).
    *
    * Semantics (the standard batch-ingest rule):
    *   1. a new doc LSH-colliding with a KEPT doc at ≥ `thresholdPpm`
    *      estimated Jaccard is dropped (the old corpus always wins);
    *   2. the survivors are deduped among themselves
    *      (cluster → min-id keeper), exactly as [[dedupCorpus]];
    *   3. the returned index is `keptSigs` ∪ signatures of the kept
    *      new docs — feed it to the next batch.
    *
    * Returns (kept new docs, updated signature index).
    *
    * 100 TB shape: the old corpus never moves — only its band keys
    * (derived from the stored signatures, 8 rows/doc) meet the new
    * batch's band keys in one hash join keyed on (band, md5); per-batch
    * cost is O(batch) + O(index band table), never O(corpus text).
    * `keptSigs` is consumed TWICE per call (band keys + the estimate
    * join-back) — hand it a parquet-backed or checkpointed frame, not
    * a live compute lineage, or the signature derivation re-runs per
    * consumer (the streaming maintainer reads it from the versioned
    * index dir for exactly this reason). */
  def incrementalDedup(newDocs: DataFrame, idCol: String, text: Column,
                       keptSigs: DataFrame,
                       shingleN: Int = 3, perms: Int = 64, bands: Int = 8,
                       thresholdPpm: Long = 900000L)
      : (DataFrame, DataFrame) = {
    val sigNew = checkpointCorpus(
      minhashSignatures(newDocs, idCol, text, shingleN, perms))
    val crossPairs = bandTable(keptSigs, perms, bands)
      .select(col("b"), col("h"), col("did").as("ida"))
      .join(bandTable(sigNew, perms, bands)
        .select(col("b"), col("h"), col("did").as("idb"))
        .hint("shuffle_hash"), Seq("b", "h"))
      .select("ida", "idb")
      .dropDuplicates("ida", "idb")
    val vsOld = estimatePairs(crossPairs, keptSigs, sigNew)
      .where(col("est_jaccard_ppm") >= thresholdPpm)
      .select(col("idb").as("did")).distinct()
    val survSigs = checkpointCorpus(
      sigNew.join(vsOld, Seq("did"), "left_anti"))
    val withinPairs = candidatesFromSigs(survSigs, perms, bands)
      .where(col("est_jaccard_ppm") >= thresholdPpm)
    val losers = clusterLabels(withinPairs)
      .where(col("did") =!= col("label")).select("did")
    val dropped = vsOld.unionByName(losers).distinct()
    val kept = newDocs.join(
      dropped.withColumnRenamed("did", idCol), Seq(idCol), "left_anti")
    val keptNewSigs = survSigs.join(losers, Seq("did"), "left_anti")
    (kept, keptSigs.unionByName(keptNewSigs))
  }

  /** DELETE door for the signature index (the dedup twin of
    * `Bm25Index.applyTombstones` / `Similarity.ivfApplyTombstones`):
    * drop tombstoned docs' signature rows so future batches stop
    * deduping against them — a retracted document must not keep
    * shadowing fresh near-duplicates. The index is one row per doc, so
    * delete ≡ an index rebuilt on the surviving corpus by construction
    * (spec-pinned); the broadcast anti-join costs |tombstones| ×
    * index rows, never corpus text. */
  def removeFromIndex(keptSigs: DataFrame,
                      tombstones: DataFrame): DataFrame =
    keptSigs.join(broadcast(tombstones.select(col("did"))), Seq("did"),
      "left_anti")

  // Generation-versioned signature rows — the dedup twin of
  // `Bm25Index.stampGen`/`applyGenTombstones`, for the same reason: on
  // an APPEND-ONLY persisted signature store, updating a document means
  // retracting its old signature (it must stop shadowing fresh
  // near-dups) while the re-indexed version's row — same did — must
  // survive; a plain did tombstone swallows both. Stamp every appended
  // batch, retire the did up to the superseded generation, serve
  // through the gen filter; deletes unify as upto_gen = Long.MaxValue.

  def sigStampGen(sigs: DataFrame, gen: Long): DataFrame =
    sigs.withColumn("gen", lit(gen))

  def sigGenTombstones(ids: DataFrame, idCol: Column,
                       uptoGen: Long): DataFrame =
    ids.select(idCol.as("did"), lit(uptoGen).as("upto_gen"))

  def applySigGenTombstones(sigs: DataFrame,
                            tombstones: DataFrame): DataFrame = {
    val t = broadcast(tombstones
      .select(col("did").as("__t_did"), col("upto_gen")))
    sigs.join(t,
      sigs("did") === col("__t_did") &&
        sigs("gen") <= col("upto_gen"), "left_anti")
  }

  /** The one-call UPDATE door for the persisted signature store,
    * `Bm25Index.update`'s dedup twin: re-sign the replacement documents,
    * stamp the rows with `newGen`, retire every older generation of
    * their ids — returns `(sigDelta, tombstones)`; append the delta,
    * union the tombstones, serve through [[applySigGenTombstones]].
    * O(delta): one delta-sized shingle/minhash pass — the store is
    * never read. The superseded documents are not needed, only their
    * ids (the new batch's own ids). `newGen` must exceed every
    * generation the updated ids currently carry.
    *
    * Retry guard, same contract as `Bm25Index.update`: pass the CURRENT
    * unified tombstone table (`(did, upto_gen)`; full deletes carry
    * `upto_gen = Long.MaxValue`) and a re-sent batch is dropped whole —
    * a retried id would otherwise append a duplicate gen-`newGen`
    * signature row and double-count itself as its own near-duplicate. */
  def sigUpdate(newDocs: DataFrame, idCol: String, text: Column,
                shingleN: Int, perms: Int, newGen: Long,
                priorTombstones: Option[DataFrame] = None)
      : (DataFrame, DataFrame) = {
    val fresh = priorTombstones match {
      case Some(prior) =>
        val done = broadcast(
          prior.where(col("upto_gen") >= lit(newGen - 1))
            .select(col("did").as("__t_did")))
        newDocs.join(done, col(idCol) === col("__t_did"), "left_anti")
      case None => newDocs
    }
    (sigStampGen(minhashSignatures(fresh, idCol, text, shingleN, perms),
      newGen),
      sigGenTombstones(fresh.select(col(idCol).as("did")), col("did"),
        newGen - 1))
  }

  /** Compaction trigger for ALL the tombstone doors ([[removeFromIndex]],
    * `Bm25Index.applyTombstones`, `Similarity.ivfApplyTombstones`) — the
    * lifecycle twin of `ZOrder.refitNeeded`: a cheap check that RIDES
    * EVERY delete instead of waiting for the failure.
    *
    * The doors' scale contract is "broadcast anti-join until tombstones
    * outgrow broadcast comfort, then a physical compaction rewrite drops
    * the tombstone table" — but an operator that keeps deleting without
    * compacting eventually pushes the forced-broadcast build past driver
    * comfort and, at Spark's 8 GB/512M-row hard caps, into outright
    * query failure. Nothing used to WATCH that growth. This does:
    * estimated broadcast footprint = |tombstones| × `bytesPerRow`
    * (one 8-byte key in an UnsafeRow plus the LongHashedRelation entry
    * overhead), compared against the same 10 MB comfort line Spark's
    * own `autoBroadcastJoinThreshold` defaults to. The 64 B/row
    * default is CALIBRATED against the executed anti-join's measured
    * broadcast dataSize (`PlanSpec` "compactNeeded calibration"):
    * sparse long keys — the realistic tombstone layout — cost
    * ~32.8 B/row marginal over a ~1 MB base allocation (dense key
    * ranges drop to ~8 B/row), so 64 B/row brackets the worst marginal
    * at <2× and the unmodeled base only fires the trigger EARLY, the
    * safe side of a corpus-sized rewrite. One TOMBSTONE-SET-sized
    * count() per delete tick — never index- or corpus-sized work, and
    * the count re-walks the tombstone union lineage unless the caller
    * checkpoints it each tick (the soak and `Maintenance.tick` do).
    *
    * `true` means: schedule the compaction NOW — materialize the
    * filtered index through its canonical writer (`Bm25Index.write` /
    * the IVF store's per-cell rewrite / the signature table itself) and
    * drop the tombstone table. Probes over the compacted store carry no
    * anti-join at all (spec-pinned). */
  def compactNeeded(tombstones: DataFrame,
                    thresholdBytes: Long = 10L << 20,
                    bytesPerRow: Long = 64L): Boolean =
    compactNeededFromCount(tombstones.count(), thresholdBytes, bytesPerRow)

  /** [[compactNeeded]] from an already-known tombstone row count — the
    * job-free form for callers that observed the count inside an action
    * they ran anyway (`Maintenance.saveState`'s snapshot write). Same
    * arithmetic, same thresholds: the two forms make the identical
    * decision on the identical number. */
  def compactNeededFromCount(nTombstones: Long,
                             thresholdBytes: Long = 10L << 20,
                             bytesPerRow: Long = 64L): Boolean = {
    require(thresholdBytes > 0 && bytesPerRow > 0,
      "compactNeeded thresholds must be positive")
    nTombstones * bytesPerRow > thresholdBytes
  }

  /** Resolve candidate pairs (ida < idb) into duplicate clusters: every
    * node gets the smallest id in its connected component. Returns
    * (did, label).
    *
    * Near-dup candidate graphs are TINY relative to the corpus (pairs
    * above a high similarity threshold are rare), so when the edge set
    * fits a bounded driver budget the components resolve with one collect
    * + union-find — zero shuffles, exact. Past the budget (or with
    * `driverMaxEdges = 0`) the distributed min-label propagation runs TO
    * FIXPOINT: sweeps continue until one pass changes no label (existence
    * check — a fixed sweep budget would split duplicate chains longer than
    * the budget and keep extra "keepers"); each sweep is one join + one
    * aggregate with `localCheckpoint` lineage truncation, converging in
    * ≤ graph-diameter sweeps (near-star LSH graphs: 2–3). */
  def clusterLabels(pairs: DataFrame, maxIterations: Int = 100,
                    driverMaxEdges: Long = 4000000L): DataFrame = {
    val spark = pairs.sparkSession
    val edgeRows =
      if (driverMaxEdges > 0)
        pairs.select(col("ida").cast("long"), col("idb").cast("long"))
          .limit(driverMaxEdges.toInt + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (driverMaxEdges > 0 && edgeRows.length <= driverMaxEdges) {
      // driver-side union-find with path compression, then min-per-root
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      edgeRows.foreach { e =>
        val (a, b) = (e.getLong(0), e.getLong(1))
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.put(ra, rb)
      }
      import scala.jdk.CollectionConverters._
      val nodes = parent.keySet().asScala.toSeq
      val minOfRoot = new java.util.HashMap[Long, Long]()
      nodes.foreach { n =>
        val r = find(n)
        val cur = minOfRoot.getOrDefault(r, Long.MaxValue)
        if (n < cur) minOfRoot.put(r, n)
      }
      import spark.implicits._
      nodes.map(n => (n, minOfRoot.get(find(n)))).toDF("did", "label")
    } else {
      val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
        .unionByName(pairs.select(col("idb").as("src"), col("ida").as("dst")))
        .localCheckpoint(true)
      var labels = edges.select(col("src").as("did")).distinct()
        .withColumn("label", col("did"))
        .localCheckpoint(true)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIterations) {
        val prop = edges.join(labels.withColumnRenamed("did", "src"), Seq("src"))
          .select(col("dst").as("did"), col("label"))
        val next = labels.unionByName(prop)
          .groupBy("did").agg(min("label").as("label"))
          .localCheckpoint(true)
        converged = next.as("n")
          .join(labels.as("o"), "did")
          .where(col("n.label") =!= col("o.label"))
          .isEmpty
        labels = next
        iter += 1
      }
      labels
    }
  }

  /** End-to-end corpus dedup: MinHash-LSH candidates at `thresholdPpm`
    * estimated Jaccard → cluster resolution → keep the smallest id per
    * cluster (and every unpaired doc). Returns the kept rows of `df`. */
  def dedupCorpus(df: DataFrame, idCol: String, text: Column,
                  thresholdPpm: Long = 900000L): DataFrame = {
    val pairs = minhashCandidates(df, idCol, text)
      .where(col("est_jaccard_ppm") >= thresholdPpm)
    val labels = clusterLabels(pairs)
    val losers = labels.where(col("did") =!= col("label"))
      .select(col("did").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** SimHash bit width: 60 bits — every bit of the portable 60-bit token
    * hash (4 bands × 15 bits for the banded candidate join). */
  val SimhashBits: Int = 60

  /** 60-bit SimHash of the token multiset: bit b is set when the
    * ±1-weighted sum of token-hash bits at position b is positive. */
  def simhash64(text: Column): Column = {
    // hash each token once; bit b of the simhash is 1 when more than half
    // of the token hashes have bit b set (sum of ±1 weights > 0)
    val hashes = transform(TextAnalysis.tokens(text), t => portableHash(t))
    val n = size(hashes)
    (0 until SimhashBits).map { b =>
      val pop = size(filter(hashes,
        h => shiftright(h, b).bitwiseAND(lit(1L)) === 1L))
      when(pop * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash table via explode + hash-aggregate (codegen'd, same rationale
    * as [[minhashSignatures]]): per doc, 60 conditional ±1 sums over token
    * hashes, then assemble the bits. */
  def simhashes(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val base = df
      .select(col(idCol).as("did"),
        explode(TextAnalysis.tokens(text)).as("t"))
      .select(col("did"), portableHash(col("t")).as("h"))
    val bitSums = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b$b")
    }
    base.groupBy("did").agg(bitSums.head, bitSums.tail: _*)
      .select(col("did"),
        (0 until SimhashBits).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sh"))
  }

  /** SimHash near-dup candidates: bucket by 15-bit bands (a pair within
    * Hamming distance ≤3 shares at least one of 4 bands), then verify with
    * bit_count(xor) — no all-pairs scan. */
  def simhashPairs(df: DataFrame, idCol: String, text: Column,
                   maxHamming: Int = 3): DataFrame = {
    val h = simhashes(df, idCol, text)
    val banded = h.withColumn("band",
      explode(array((0 until 4).map(b => struct(lit(b).as("b"),
        shiftright(col("sh"), b * 15).bitwiseAND(lit(32767L)).as("v"))): _*)))
    val l = banded.select(col("band.b").as("b"), col("band.v").as("v"),
      col("did").as("ida"), col("sh").as("sha"))
    val r = banded.select(col("band.b").as("b"), col("band.v").as("v"),
      col("did").as("idb"), col("sh").as("shb"))
    l.join(r.hint("shuffle_hash"), Seq("b", "v")) // corpus x corpus: never broadcast
      .where(col("ida") < col("idb"))
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .where(col("hamming") <= maxHamming)
      .select("ida", "idb", "hamming")
      .dropDuplicates("ida", "idb")
  }
}
