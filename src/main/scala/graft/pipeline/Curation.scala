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
}
