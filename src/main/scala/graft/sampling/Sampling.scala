package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and splitting for training-data
  * pipelines. Assignment is a pure function of the row key (md5 of
  * key:salt), so splits are reproducible across runs, engines, cluster
  * sizes, and partitionings — the property that matters when a train/test
  * split must stay stable for the lifetime of a model line. Narrow
  * projections only: no shuffle, no state, trivially parallel at any scale.
  */
object Sampling {

  /** First 4 hex chars of md5(key:salt) — 16 bits of deterministic,
    * key-derived randomness, compared as hex strings (identical semantics
    * in any engine with md5). */
  private def bucket(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 4)

  /** Threshold hex string t such that P(bucket < t) ≈ fraction. */
  private def threshold(fraction: Double): String =
    f"${math.round(fraction * 65536).toInt}%04x"

  /** Tag every row with a stable "train"/"test" split.
    * Within any stratum the split is ~`trainFraction` because the hash is
    * independent of all attributes — stratification comes free. */
  def trainTestSplit(
      df: DataFrame,
      keyCol: String,
      trainFraction: Double = 0.9,
      salt: String = "graft"): DataFrame = {
    require(trainFraction > 0 && trainFraction < 1, s"bad fraction $trainFraction")
    df.withColumn("split",
      when(bucket(col(keyCol), salt) < lit(threshold(trainFraction)), "train")
        .otherwise("test"))
  }

  /** Keep a stable ~`fraction` of rows, chosen by key hash — the
    * deterministic counterpart of df.sample (which depends on partitioning
    * and seed plumbing). */
  def deterministicSample(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = "graft"): DataFrame =
    df.filter(bucket(col(keyCol), salt) < lit(threshold(fraction)))
}
