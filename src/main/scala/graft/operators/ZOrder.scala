package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{MortonCode, MortonCode3, MortonCode4, QuantileBucket}

/** Z-order data-layout clustering — the `OPTIMIZE ZORDER BY` operation of
  * Delta/Iceberg, as a plain DataFrame transform.
  *
  * Why it matters at 100 TB: a table sorted by ONE column prunes scans on
  * that column only; a table clustered along the Z-curve of TWO columns
  * carries tight per-file min/max ranges for BOTH, so a selective filter
  * on either (or both) dimensions skips most files. The layout pass
  * itself is one Spark shuffle — exactly what a nightly OPTIMIZE job
  * wants.
  *
  * Scale shape:
  *  - quantile normalization: `approxQuantile` (Greenwald-Khanna), ONE
  *    aggregate pass for both dimensions — skewed raw keys would
  *    otherwise collapse onto a few curve cells and the layout degrades
  *    to a linear sort on the hot dimension;
  *  - code assignment: codegen'd [[QuantileBucket]] + [[MortonCode]]
  *    projection, no shuffle;
  *  - placement: `repartitionByRange` on the code (sampled range
  *    boundaries — balanced output files even when curve cells are
  *    uneven) + `sortWithinPartitions` so parquet row-group stats are
  *    tight, ONE exchange total.
  */
object ZOrder {

  /** Z-curve key of two long dimensions (low 16 bits each) — the raw
    * building block; also SQL-registered as `morton_code`. */
  def code(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(MortonCode(toExpression(a), toExpression(b)))
  }

  /** N-dimensional Z-curve key (N = 2..4; 16/21/16 bits per dim). */
  def codeN(dims: Seq[Column]): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    dims.map(toExpression) match {
      case Seq(a, b) => toColumn(MortonCode(a, b))
      case Seq(a, b, c) => toColumn(MortonCode3(a, b, c))
      case Seq(a, b, c, d) => toColumn(MortonCode4(a, b, c, d))
      case other => throw new IllegalArgumentException(
        s"z-order takes 2 to 4 dimensions, got ${other.size}")
    }
  }

  /** 2-D Hilbert-curve key — tighter locality than the Z-curve (every
    * consecutive pair of curve positions is grid-adjacent; no diagonal
    * jumps), at the cost of a 16-round loop per row. SQL:
    * `hilbert_code(a, b)`. */
  def hilbert(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    toColumn(graft.functions.HilbertCode(toExpression(a), toExpression(b)))
  }

  private def bucket(c: Column, bounds: Array[Double]): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    // NULL → NaN → bucket 0: the layout key must be total
    toColumn(QuantileBucket(
      toExpression(coalesce(c.cast("double"), lit(Double.NaN))),
      bounds.toSeq))
  }

  /** Cluster `df` along the Z-curve of two numeric columns.
    *
    * @param bits  quantile resolution per dimension (2^bits buckets;
    *              default 256 — with 16-bit interleave headroom)
    * @param keepCodeAs keep the computed curve key under this column
    *              name (diagnostics/tests); default drops it
    */
  def cluster(df: DataFrame, colA: String, colB: String,
              partitions: Int, bits: Int = 8, relErr: Double = 1e-3,
              keepCodeAs: Option[String] = None): DataFrame =
    clusterN(df, Seq(colA, colB), partitions, bits, relErr, keepCodeAs)

  /** Cluster `df` along a space-filling curve of 2 to 4 numeric
    * columns — the general `OPTIMIZE ZORDER BY (c1, …, cN)`. Same cost
    * shape at any N: ONE `approxQuantile` pass over all dimensions at
    * once, one codegen'd projection, one range exchange.
    *
    * @param curve `"morton"` (any N) or `"hilbert"` (2-D only —
    *              tighter boxes, loop-per-row key) */
  def clusterN(df: DataFrame, cols: Seq[String], partitions: Int,
               bits: Int = 8, relErr: Double = 1e-3,
               keepCodeAs: Option[String] = None,
               curve: String = "morton"): DataFrame = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order takes 2 to 4 columns, got ${cols.size}")
    require(curve == "morton" || (curve == "hilbert" && cols.size == 2),
      s"curve must be morton (any N) or hilbert (2-D), got $curve/${cols.size}-D")
    val maxBits = if (cols.size == 3) 21 else 16
    require(bits >= 1 && bits <= maxBits,
      s"bits must be 1..$maxBits for ${cols.size}-D, got $bits")
    val bounds = layoutBounds(df, cols, bits, relErr)
    clusterWith(df, cols, partitions, bounds, keepCodeAs, curve)
  }

  /** The layout CONTRACT: per-dimension bucket boundaries (interior
    * quantiles, 1/n .. (n-1)/n), computed in one `approxQuantile` pass.
    * Persist these alongside the table — they are what incremental
    * [[clusterDelta]] batches key against. */
  def layoutBounds(df: DataFrame, cols: Seq[String], bits: Int = 8,
                   relErr: Double = 1e-3): Array[Array[Double]] = {
    val n = 1 << bits
    val probs = Array.tabulate(n - 1)(i => (i + 1).toDouble / n)
    df.stat.approxQuantile(cols.toArray, probs, relErr)
  }

  /** Incremental layout maintenance: key a DELTA batch against FROZEN
    * bounds — the frozen-quantizer pattern the IVF index uses
    * ([[graft.pipeline.Similarity.ivfAddToIndex]]). The delta's files
    * land in the SAME curve key space as the base table, so their
    * parquet min/max stats stay as tight and skippable as the base's;
    * appending O(delta) work per batch replaces re-clustering the whole
    * table per arrival. Bounds drift as the distribution moves — the
    * nightly full [[clusterN]] re-fit (the census rebase / IVF re-seed
    * cadence) re-pins them; until then skipping degrades only as far as
    * the drift, never to a layout mismatch (every key is still total).
    */
  def clusterDelta(delta: DataFrame, cols: Seq[String], partitions: Int,
                   bounds: Array[Array[Double]],
                   curve: String = "morton"): DataFrame =
    clusterWith(delta, cols, partitions, bounds, None, curve)

  private def clusterWith(df: DataFrame, cols: Seq[String],
                          partitions: Int, bounds: Array[Array[Double]],
                          keepCodeAs: Option[String],
                          curve: String): DataFrame = {
    val dims = cols.zip(bounds).map { case (c, bs) => bucket(col(c), bs) }
    val zc =
      if (curve == "hilbert") hilbert(dims(0), dims(1)) else codeN(dims)
    val keyed = df.withColumn("__zcode", zc)
      .repartitionByRange(partitions, col("__zcode"))
      .sortWithinPartitions(col("__zcode"))
    keepCodeAs match {
      case Some(name) => keyed.withColumnRenamed("__zcode", name)
      case None => keyed.drop("__zcode")
    }
  }
}
