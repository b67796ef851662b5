package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, token
  * counting, language-ID (stopword/n-gram heuristic), quality scoring,
  * document fingerprinting. All pure Catalyst expressions (array/higher-order
  * functions — codegen-friendly, no UDFs), so they run scan-parallel with no
  * shuffle: the shape that holds at 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenizer (lowercased). */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** GPT-2-style byte-pair pre-tokenization regex, restricted to the
    * lookahead-free subset (RE2 has no `(?!`) so Java regex (Spark) and
    * RE2 (DuckDB oracle) match identically: contraction suffixes, then
    * optionally-space-prefixed letter / digit / punctuation runs.
    * Whitespace runs that precede a token attach to it (the ` ?` prefix);
    * residual whitespace matches nothing and is not counted. */
  val BpePreTokenRegex: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s']+"

  /** BPE pre-token count — the budgeting unit of byte-pair tokenizers
    * (whitespace counting under-counts punctuation-heavy text). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePreTokenRegex), lit(0))).cast("long")

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose — a broadcastable literal, not a model. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"))

  /** Count of tokens present in a marker set (occurrence count, not
    * distinct) — compiled one-set case of
    * [[graft.functions.MarkerHits]]. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    element_at(graft.functions.MarkerHits.marker_hits(toks, Seq(markers)), 1)

  /** Predicted language: argmax of marker-hit counts; ties broken by
    * language code order; `und` when no marker hits at all. ALL languages
    * score in one compiled pass over the tokens. */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val counts = graft.functions.MarkerHits.marker_hits(
      tokens(text), langs.map(stopwords))
    val scores = langs.zipWithIndex.map { case (l, i) =>
      l -> element_at(counts, i + 1)
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(best > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Quality signals: length, token count, vocabulary diversity, mean word
    * length (×100, floored — integer-exact), stopword ratio in ppm. */
  def qualitySignals(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val en = stopwords("en")
    df.withColumn("n_chars_text", length(text).cast("long"))
      .withColumn("n_tokens", nTok)
      .withColumn("n_distinct_tokens", size(array_distinct(toks)).cast("long"))
      .withColumn("mean_token_len_x100",
        floor(lit(100.0) * (length(regexp_replace(text, "\\s+", ""))) / nTok).cast("long"))
      .withColumn("stopword_ppm",
        floor(lit(1000000.0) * markerHits(toks, en) / nTok).cast("long"))
  }

  /** Quality gate for training-data filtering: token-count window plus a
    * minimum vocabulary-diversity ratio (distinct/total, in ppm). Returns
    * the passing rows — a plain pushdown-friendly predicate, no UDF. */
  def qualityFilter(df: DataFrame, text: Column,
                    minTokens: Long = 5, maxTokens: Long = 100000,
                    minDistinctPpm: Long = 100000): DataFrame = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val distinctPpm = floor(lit(1000000.0) * size(array_distinct(toks)) / n).cast("long")
    df.where(n >= minTokens && n <= maxTokens && distinctPpm >= minDistinctPpm)
  }

  /** Repetition signals per document — the Gopher-style quality rules
    * used to drop boilerplate/spam from training corpora (published in
    * the Gopher paper's §A.1.1 filtering appendix and replicated by every
    * open curation stack since):
    *   - `top_word_ppm`: share of the single most frequent word,
    *   - `top_bigram_ppm`: share of the most frequent word 2-gram,
    *   - `dup_trigram_ppm`: share of 3-gram OCCURRENCES that are repeats
    *     of an already-seen 3-gram.
    * All integer ppm (floor) over word counts — engine-portable, so the
    * whole computation carries a DuckDB oracle.
    *
    * Shape at scale: one posexplode (words), one window per doc for the
    * n-gram shifts (partitioned by doc — distributes), then per-level
    * hash aggregations keyed on (doc, gram). Everything is linear in
    * total token count; no all-pairs, nothing on the driver. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val grams = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("w2", lead("w", 1).over(win))
      .withColumn("w3", lead("w", 2).over(win))
    val uni = grams.groupBy(col("doc_id"), col("w")).count()
      .groupBy(col("doc_id"))
      .agg(sum("count").as("n_words"), max("count").as("top_w"))
    val bi = grams.where(col("w2").isNotNull)
      .select(col("doc_id"), concat(col("w"), lit(" "), col("w2")).as("g"))
      .groupBy(col("doc_id"), col("g")).count()
      .groupBy(col("doc_id"))
      .agg(sum("count").as("n_bi"), max("count").as("top_bi"))
    val tri = grams.where(col("w3").isNotNull)
      .select(col("doc_id"),
        concat(col("w"), lit(" "), col("w2"), lit(" "), col("w3")).as("g"))
      .groupBy(col("doc_id"), col("g")).count()
      .groupBy(col("doc_id"))
      .agg(sum("count").as("n_tri"), count(lit(1)).as("distinct_tri"))
    uni.join(bi, Seq("doc_id"), "left").join(tri, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_words"),
        floor(col("top_w") * 1000000L / col("n_words")).cast("long")
          .as("top_word_ppm"),
        coalesce(floor(col("top_bi") * 1000000L / col("n_bi")).cast("long"),
          lit(0L)).as("top_bigram_ppm"),
        coalesce(floor((col("n_tri") - col("distinct_tri")) * 1000000L /
          col("n_tri")).cast("long"), lit(0L)).as("dup_trigram_ppm"))
  }

  /** Gopher-style repetition gate over [[repetitionSignals]]: census of
    * documents dropped by each rule and kept overall. Defaults are the
    * published thresholds (top word > 30 %, top 2-gram > 20 %, duplicate
    * 3-grams > 30 %); they are parameters because every production corpus
    * tunes them (and the test fixture uses tighter ones so each rule
    * provably fires — a census that can only ever report "all kept" checks
    * nothing). */
  def repetitionFilterCensus(docs: DataFrame,
                             topWordPpm: Long = 300000L,
                             topBigramPpm: Long = 200000L,
                             dupTrigramPpm: Long = 300000L): DataFrame = {
    val s = repetitionSignals(docs)
    s.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("top_word_ppm") > topWordPpm, 1L).otherwise(0L))
        .as("drop_top_word"),
      sum(when(col("top_bigram_ppm") > topBigramPpm, 1L).otherwise(0L))
        .as("drop_top_bigram"),
      sum(when(col("dup_trigram_ppm") > dupTrigramPpm, 1L).otherwise(0L))
        .as("drop_dup_trigram"),
      sum(when(col("top_word_ppm") <= topWordPpm &&
          col("top_bigram_ppm") <= topBigramPpm &&
          col("dup_trigram_ppm") <= dupTrigramPpm, 1L).otherwise(0L))
        .as("kept"))
  }

  /** Corpus-trained unigram commonness per document — the integer-exact
    * analog of an LM-perplexity quality filter (CCNet's KenLM step): score
    * each doc by how common its tokens are in the WHOLE corpus.
    * `commonness_ppm = 1e6 · Σ count(tok) / (n_tokens · N)` where N is the
    * corpus token total — 1e6× the expected unigram probability of a
    * random token from the doc. Rare-token-heavy docs (noise, mojibake)
    * score low; boilerplate scores high; both tails are drop candidates.
    *
    * Shape at scale: one explode (linear), a vocab-sized aggregate, a
    * join of tokens against the vocab (vocab ≪ corpus — AQE broadcasts
    * when it fits, hash-join otherwise), one per-doc re-aggregate. The
    * corpus total is a 1-row scalar combine. DIV keeps it engine-exact
    * (all terms nonnegative); >9e12-token corpora need the DECIMAL(38,0)
    * swap for the 1e6 multiply. */
  def unigramCommonness(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val toks = df.select(col(idCol).as("did"), explode(tokens(text)).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__c"))
    val total = vocab.agg(sum(col("__c")).as("__N"))
    toks.join(vocab, Seq("tok"))
      .groupBy(col("did"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__c")).as("__sumc"))
      .crossJoin(total) // scalar combine
      .select(col("did"), col("n_tokens"),
        expr("CAST((1000000 * __sumc) DIV (n_tokens * __N) AS BIGINT)")
          .as("commonness_ppm"))
  }

  /** Content fingerprint (md5 of normalized text) — portable across engines. */
  /** Feature-hashed document embedding (the "hashing trick", Weinberger
    * et al. 2009): component `j` is the sum over TOKEN OCCURRENCES of a
    * pseudo-random ±signal derived from the token's portable hash under
    * permutation `j` — a model-free text→vector featurizer whose cosine
    * tracks bag-of-words overlap, so every embedding operator (near-dup,
    * ANN, semantic decontamination) applies to corpora with no embedding
    * model in reach. All integer arithmetic (portable md5 hash + the
    * minhash affine-permutation family, centered on (P−1)/2), components
    * exact in doubles (|Σ| ≪ 2⁵³) — the whole vector reproduces in SQL.
    *
    * Composable nested-HOF form (dims × tokens interpreted work per doc);
    * a compiled expression is the optimization path if this ever sits in
    * a hot loop — same swap [[graft.functions.NGramShingles]] made. */
  def hashedEmbedding(text: Column, dims: Int): Column =
    graft.functions.HashedEmbedding.hashed_embedding(tokens(text), dims)

  /** The composable (interpreted nested-HOF) formulation the codegen'd
    * [[graft.functions.HashedEmbedding]] mirrors byte-for-byte — kept as
    * the equivalence-test reference and the SQL-only fallback. */
  def hashedEmbeddingComposable(text: Column, dims: Int): Column = {
    val center = (Dedup.HashP - 1L) / 2L
    val hs = transform(tokens(text),
      t => Dedup.portableHash(t) % Dedup.HashP)
    // components normalized by P: keeps downstream LSH quantization
    // (⌊v·2²⁰⌋ × 31-bit coefficients) inside 64-bit integer range —
    // raw Σ-of-permutation sums (~2³⁰ per token) would overflow it
    transform(sequence(lit(0), lit(dims - 1)), j =>
      aggregate(hs, lit(0L), (acc, h) =>
        acc + (elementPermute(h, j) - center)).cast("double")
        / lit(Dedup.HashP.toDouble))
  }

  /** `Dedup.permute` with a COLUMN permutation index (the minhash family
    * takes a literal k; the embedding builds all dims in one expression). */
  private def elementPermute(h: Column, j: Column): Column =
    (h * (((j + 1).cast("long") * 2654435761L) % Dedup.HashP) +
      ((j + 1).cast("long") * 40503L) % Dedup.HashP) % Dedup.HashP

  /** BM25-style ranked retrieval: top-k documents for a query term set.
    * Scoring is the BM25 shape (k1=1.2, b=0.75) RATIONALIZED to exact
    * integer arithmetic — the tf saturation term multiplied through by
    * 10·total_len becomes 22·tf·total_len / (10·tf·total_len +
    * 3·total_len + 9·dl·N), and the idf is the probabilistic
    * linearization (N−df)/N in ppm — so a distributed top-k is
    * bit-reproducible across runs and engines (fp partial-sum order
    * cannot flip ranks; the ln-idf is a one-expression swap where
    * calibration outranks reproducibility).
    *
    * Shape at scale: NO inverted index and NO corpus-sized shuffle.
    * Only the query terms' tf, the doc length, and per-term document
    * frequencies feed the score, so one scan computes a narrow per-doc
    * frame (doc_id, dl, tf per query term — higher-order `filter`/`size`
    * on the token array, codegen'd, no explode). That frame is
    * CHECKPOINTED (it feeds the stats aggregate and the scoring pass;
    * without materialization each would re-tokenize the corpus), the
    * corpus constants (N, total_len, per-term df) collapse to ONE 1-row
    * aggregate that rides a broadcast, scoring is a pure projection —
    * a tf=0 term contributes exactly 0 in the integer arithmetic, so no
    * per-term filtering join is needed — and the top-k is a TakeOrdered.
    * The only exchanges at any corpus size: the 1-row stats agg and the
    * broadcast. */
  def bm25TopK(df: DataFrame, idCol: Column, text: Column,
               qTerms: Seq[String], k: Int): DataFrame = {
    val terms = qTerms.distinct
    val toks = tokens(text)
    val perDoc = Dedup.checkpointCorpus(df
      .where(text.isNotNull)
      .select(idCol.as("doc_id"),
        size(toks).cast("long").as("dl"),
        array(terms.map(t =>
          size(filter(toks, x => x === lit(t))).cast("long")): _*)
          .as("tfs")))
    val stats = perDoc.agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("total_len"),
      array(terms.indices.map(i =>
        sum((col("tfs")(i) > lit(0L)).cast("long"))): _*).as("dfs"))
    val score = terms.indices.map { i =>
      expr(s"(cast(n - dfs[$i] as decimal(38,0)) * 1000000 div n) * " +
        s"(cast(22 as decimal(38,0)) * tfs[$i] * total_len * 1000000 div " +
        s"(cast(10 as decimal(38,0)) * tfs[$i] * total_len + " +
        s"cast(3 as decimal(38,0)) * total_len + " +
        s"cast(9 as decimal(38,0)) * dl * n))")
    }.reduce(_ + _)
    perDoc
      .where(exists(col("tfs"), _ > lit(0L)))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  def fingerprintMd5(text: Column): Column = md5(lower(trim(text)))

  /** 64-bit rolling-style fingerprint: xxhash64 over normalized text plus a
    * token-order-sensitive combine (xxhash64 of the token array). Fast,
    * engine-internal (not oracle-portable). */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(trim(text)))
}
