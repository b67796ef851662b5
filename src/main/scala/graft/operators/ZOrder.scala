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
    * [[refitNeeded]] rides each batch and pulls the re-fit FORWARD when
    * the delta's distribution has visibly left the fitted one.
    */
  def clusterDelta(delta: DataFrame, cols: Seq[String], partitions: Int,
                   bounds: Array[Array[Double]],
                   curve: String = "morton"): DataFrame =
    clusterWith(delta, cols, partitions, bounds, None, curve)

  /** Re-fit trigger input for the incremental layout: how far a DELTA
    * batch has drifted from the frozen bounds, per dimension, as
    * total-variation distance in ppm — the same integer-exact TVD
    * convention as [[graft.streaming.EventsStream.driftMonitor]].
    *
    * The frozen bounds are interior quantiles of the FITTED
    * distribution, so an undrifted delta fills every bucket with ~1/n
    * of its rows; a shifted delta piles into few buckets and TVD rises
    * toward 1e6. Cost: one codegen'd bucketing projection and one
    * aggregate whose partial-agged shuffle is ≤ dims × n records —
    * cheap enough to ride EVERY maintenance batch, so bounds drift is
    * observed as it happens instead of decaying scan skippability
    * silently until the nightly re-fit. Exactness: decimal operands
    * before the cross-multiply (a whale delta's cnt·n·1e6 wraps a
    * BIGINT) and integer `div`, so thresholds never flap on last-ulp
    * variance. Sampling noise scales ~ n_buckets/√|delta|: with the
    * default 256 buckets a ≥100k-row in-distribution delta sits well
    * under 10% TVD, far from the default 25% trigger. */
  def layoutDriftPpm(delta: DataFrame, cols: Seq[String],
                     bounds: Array[Array[Double]]): Map[String, Long] = {
    // a silent zip-truncation here would DROP a dimension from the
    // drift report and refitNeeded could miss the drifted one
    require(cols.nonEmpty && cols.size == bounds.length,
      s"layoutDriftPpm needs one bounds row per column: got " +
        s"${cols.size} cols vs ${bounds.length} bounds")
    val total = delta.count()
    if (total == 0L) return cols.map(_ -> 0L).toMap
    val n = bounds.head.length + 1
    val pairs = delta
      .select(explode(array(cols.zip(bounds).zipWithIndex.map {
        case ((c, bs), i) =>
          struct(lit(i).as("dim"), bucket(col(c), bs).as("bkt"))
      }: _*)).as("p"))
      .select(col("p.dim").as("dim"), col("p.bkt").as("bkt"))
    // Σ_b |cnt_b·n − total| over PRESENT buckets; each empty bucket
    // contributes exactly `total`; TVD = Σ / (2·n·total)
    val rows = pairs.groupBy("dim", "bkt").agg(count(lit(1)).as("cnt"))
      .groupBy("dim").agg(
        sum(abs(expr(s"cast(cnt as decimal(38,0)) * $n - $total")))
          .as("present"),
        count(lit(1)).as("occupied"))
      .select(col("dim"), expr(
        s"(present + cast($n - occupied as decimal(38,0)) * $total) " +
          s"* 1000000 div (2 * $n * cast($total as decimal(38,0)))")
        .as("tvd_ppm"))
      .collect()
    rows.map(r => cols(r.getInt(0)) -> r.getLong(1)).toMap
  }

  /** True when any dimension of the delta drifted past `thresholdPpm`
    * (default 25% TVD): the maintenance job should schedule the full
    * [[clusterN]] re-fit NOW instead of waiting out the nightly cadence
    * while appended files decay toward unskippable. In-distribution
    * deltas stay far below the threshold; a shifted delta trips it
    * (spec-pinned both ways). */
  def refitNeeded(delta: DataFrame, cols: Seq[String],
                  bounds: Array[Array[Double]],
                  thresholdPpm: Long = 250000L): Boolean =
    layoutDriftPpm(delta, cols, bounds).values.exists(_ > thresholdPpm)

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
