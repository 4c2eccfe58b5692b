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

  /** As-of join: for every left row, the single latest right row with the
    * same key and `rightTime <= leftTime` (backward direction, exact
    * matches allowed) — the point-in-time lookup time-series work needs
    * (trades→quotes, events→latest-state) that plain SQL can only spell
    * as a range join plus a per-row argmax.
    *
    * Scale shape: the naive range join explodes to O(matches) rows before
    * its window prunes them. This instead UNIONS the two sides tagged by
    * origin and takes `last(right payload, ignoreNulls)` over a window
    * keyed on the join key, ordered by (time, origin) with right rows
    * first on ties — ONE shuffle on the key, one sort, output exactly
    * |left| rows, no intermediate blow-up. Both sides' time columns must
    * be the same type; right payload columns must not collide with left
    * columns (alias them first).
    *
    * Right rows that tie on (key, time) are resolved by `last` in input
    * order — pre-aggregate the right side to one row per (key, time) when
    * that matters for determinism. */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payload = right.columns.filterNot(c =>
      keys.exists(_.equalsIgnoreCase(c)) || c.equalsIgnoreCase(rightTime))
    require(payload.nonEmpty, "right side has no payload columns")
    val collisions = payload.filter(c => left.columns.exists(_.equalsIgnoreCase(c)))
    require(collisions.isEmpty,
      s"right payload collides with left columns: ${collisions.mkString(",")}")
    // the right payload rides as ONE struct so a match is atomic — per-
    // column window fills could stitch together different right rows
    // whenever a right row carries a null
    val rPacked = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+
        struct(payload.map(col): _*).as("__p")): _*)
      .withColumn("__is_left", lit(0))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__p", lit(null).cast(rPacked.schema("__p").dataType))
    // align schemas: the right side null-pads the left-only columns
    val r = l.columns.filterNot(rPacked.columns.contains).foldLeft(rPacked) {
      (df, c) => df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    // right rows sort before left rows at equal time: exact matches count
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(left.columns.map(col) ++ payload.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** Range (interval) join: every point row pairs with every interval row
    * whose `[start, end]` contains it (optionally also matching on equi
    * `keys`). Spark plans a bare non-equi condition as a broadcast
    * nested-loop / cartesian product — O(|points|·|intervals|) at any
    * scale. This bins the range dimension instead: intervals explode into
    * the fixed-width bins they cover, points map to exactly ONE bin, and
    * the join becomes a plain equi-join on (keys..., bin) followed by the
    * exact containment filter. A matching pair meets in precisely the
    * point's bin, so no dedup pass is needed.
    *
    * `binWidth` trades replication for selectivity: an interval costs
    * (length/binWidth + 1) copies, a bin gathers ~binWidth of point mass —
    * set it near the median interval length. Point/start/end columns must
    * be numeric (cast dates with `unix_date` first); the two sides must
    * not share non-key column names. */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val shared = points.columns.filter(c =>
      intervals.columns.exists(_.equalsIgnoreCase(c)) &&
        !keys.exists(_.equalsIgnoreCase(c)))
    require(shared.isEmpty,
      s"non-key columns collide across sides: ${shared.mkString(",")}")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(i, (keys :+ "__bin").toIndexedSeq, "inner")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
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
