package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Join utilities for skew — the explicit fallback when AQE's skew-join
  * split (enabled in [[graft.core.Sessions]]) isn't enough, i.e. a single
  * hot key whose rows exceed one task even after AQE splitting.
  */
object Joins {

  /** Salted equi-join: the skewed side spreads each key over `salts`
    * sub-keys; the other side replicates once per salt. Correct for inner
    * and left joins on the skewed side. The salt is derived from a spread
    * hash of the whole skewed row, not rand(), so retried tasks stay
    * deterministic. */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val s = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val r = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    s.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Convenience: salted aggregation — two-phase groupBy for a skewed key
    * (partial per (key, salt), then final per key). Catalyst's partial
    * aggregation already does this for algebraic aggregates; this shape is
    * for aggregates that are NOT map-side combinable (e.g. exact
    * collect_set cardinalities on a hot key). */
  def saltedDistinctCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("distinct_count"))
}
