package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** One-call SQL registration for the engine's custom expressions, so
  * `spark.sql` users get them by name:
  *
  *   - `cosine_similarity(a, b)`            — codegen'd cosine
  *   - `lsh_buckets(e, planes, bands)`      — banded hyperplane buckets
  *   - `ngram_shingles(tokens, n)`          — distinct word n-grams
  *   - `ngram_hashes(tokens, n)`            — positional portable gram hashes
  *   - `hashed_embedding(tokens, dims)`     — feature-hashed BoW vector
  *   - `morton_code(a, b)`                  — 2-D Z-order layout key
  *
  * Plan-time parameters (planes/bands/n) must be integer literals — they
  * shape the generated code, exactly like the Column API.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    CosineSimilarity.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_buckets",
      exprs => LshBuckets(exprs(0),
        intLit(exprs(1), "planes"), intLit(exprs(2), "bands")),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_shingles",
      exprs => NGramShingles(exprs(0), intLit(exprs(1), "n")),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_hashes",
      exprs => NGramHashes(exprs(0), intLit(exprs(1), "n")),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hashed_embedding",
      exprs => HashedEmbedding(exprs(0), intLit(exprs(1), "dims")),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries",
      exprs => MisraGries(exprs(0), intLit(exprs(1), "k")),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_code",
      exprs => HilbertCode(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "morton_code",
      exprs => exprs match {
        case Seq(a, b) => MortonCode(a, b)
        case Seq(a, b, c) => MortonCode3(a, b, c)
        case Seq(a, b, c, d) => MortonCode4(a, b, c, d)
        case other => throw new IllegalArgumentException(
          s"morton_code takes 2 to 4 dimensions, got ${other.size}")
      },
      "scala_udf")
    def asDouble(e: Expression) = org.apache.spark.sql.catalyst
      .expressions.Cast(e, org.apache.spark.sql.types.DoubleType)
    def dblLit(e: Expression, what: String): Double = e match {
      case Literal(v: Double, _) => v
      case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
      case other => throw new IllegalArgumentException(
        s"$what must be a double literal, got $other")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_digest_agg",
      exprs => QuantileDigestAgg(asDouble(exprs(0)),
        if (exprs.size > 1) dblLit(exprs(1), "eps") else 0.001),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_digest_merge_agg",
      exprs => QuantileDigestMerge(exprs(0)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_digest_query",
      exprs => QuantileDigestQuery(exprs(0), asDouble(exprs(1))),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_digest_count",
      exprs => QuantileDigestCount(exprs(0)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_digest_trim",
      exprs => QuantileDigestTrim(exprs(0), asDouble(exprs(1))),
      "scala_udf")
  }
}
