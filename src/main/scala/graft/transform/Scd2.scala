package graft.transform

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.table.LakeTable

/** SCD Type 2 dimension maintenance over a [[LakeTable]]
  * (SURVEY §2.9 M6; reference notebooks/02_silver_transformation.py:57-135).
  *
  * The dimension carries `effective_start`, `effective_end`, `is_current`,
  * `record_hash` metadata. An upsert run:
  *   1. dedups the source to the latest row per key — deterministically, via
  *      `row_number` over an explicit ordering (the reference's
  *      `dropDuplicates` keeps an arbitrary row; SURVEY §2.6 flags this as a
  *      weakness we fix);
  *   2. MERGE: closes current rows whose tracked-column hash changed
  *      (is_current=false, effective_end=ts) and inserts brand-new keys;
  *   3. appends the new versions of the just-closed keys.
  *
  * Invariants (property-tested): ≤1 current row per key; a closed row's
  * effective_end equals some batch timestamp; replaying history at any ts
  * yields exactly one row per key.
  */
object Scd2 {

  val metaCols: Seq[String] = Seq("record_hash", "effective_start", "effective_end", "is_current")

  /** Row hash over the tracked columns (same sha2(to_json(struct)) shape as
    * notebooks/01_bronze_ingestion.py:62). */
  def recordHash(trackedCols: Seq[String]) =
    sha2(to_json(struct(trackedCols.map(col): _*)), 256)

  private def withMeta(source: DataFrame, trackedCols: Seq[String], ts: Timestamp): DataFrame =
    source
      .withColumn("record_hash", recordHash(trackedCols))
      .withColumn("effective_start", lit(ts))
      .withColumn("effective_end", lit(null).cast(TimestampType))
      .withColumn("is_current", lit(true))

  /** Create the dimension table from the initial load. */
  def initialize(
      spark: SparkSession,
      dir: String,
      source: DataFrame,
      trackedCols: Seq[String],
      ts: Timestamp): LakeTable = {
    val schema = StructType(source.schema.fields ++ Seq(
      StructField("record_hash", StringType),
      StructField("effective_start", TimestampType),
      StructField("effective_end", TimestampType),
      StructField("is_current", BooleanType)))
    val t = LakeTable.create(spark, dir, schema, ifNotExists = false)
    t.append(withMeta(source, trackedCols, ts))
    t
  }

  /** One SCD2 batch: close changed rows, insert new keys, append new
    * versions. `orderBy` makes the per-key source dedup deterministic. */
  def upsert(
      table: LakeTable,
      source: DataFrame,
      keyCols: Seq[String],
      trackedCols: Seq[String],
      ts: Timestamp,
      orderBy: Seq[org.apache.spark.sql.Column] = Nil): Long = {
    val ordering = if (orderBy.nonEmpty) orderBy else keyCols.map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering.map(_.desc): _*)
    val latest = source.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val src = withMeta(latest, trackedCols, ts)

    val cond = keyCols.map(k => col(s"target.$k") === col(s"source.$k")).reduce(_ && _) &&
      col("target.is_current") === lit(true)
    table.merge(src, cond)
      .whenMatchedUpdate(
        set = Map("is_current" -> lit(false), "effective_end" -> lit(ts)),
        condition = Some(col("target.record_hash") =!= col("source.record_hash")))
      .whenNotMatchedInsertAll()
      .execute()

    // keys closed in this batch get their new version appended
    val closedKeys = table.read(Seq(col("effective_end") === lit(ts)))
      .select(keyCols.map(col): _*).distinct()
    table.append(src.join(closedKeys, keyCols, "left_semi"))
  }

  /** Dimension state as of `ts` (point-in-time join helper). */
  def asOf(table: LakeTable, ts: Timestamp): DataFrame =
    table.read().filter(
      col("effective_start") <= lit(ts) &&
        (col("effective_end").isNull || col("effective_end") > lit(ts)))
}
