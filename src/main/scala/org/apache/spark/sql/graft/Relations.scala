package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Builds a DataFrame over a caller-supplied [[FileIndex]] — the hook Spark
  * gives table formats for planning-time file skipping. `FileSourceStrategy`
  * hands every pushed-down predicate to `FileIndex.listFiles(partitionFilters,
  * dataFilters)`, so the index (not the caller) decides which files a filtered
  * query reads. Lives in the sql package namespace because `Dataset.ofRows`
  * and the `HadoopFsRelation` constructor are `private[sql]`.
  */
object Relations {
  def parquetRelation(
      spark: SparkSession,
      index: FileIndex,
      dataSchema: StructType,
      options: Map[String, String] = Map.empty): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rel = HadoopFsRelation(index, new StructType(), dataSchema, None,
      new ParquetFileFormat, options)(cs)
    org.apache.spark.sql.classic.Dataset.ofRows(cs, LogicalRelation(rel, isStreaming = false))
  }

  /** An analyzed LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — used by the native-SQL MERGE command to execute the
    * parsed source side. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Public face of the `private[sql]` [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]]
  * extension point: a V2 catalog table that declares it re-exposes Spark's
  * V1-sink fallback for `writeStream.toTable` (the route Delta's table
  * takes too). Lives here because the parent trait is sql-package-private. */
trait V1FallbackTable extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Marks a batch DataFrame as streaming — what a V1 streaming `Source` must
  * return from `getBatch` (MicroBatchExecution asserts `isStreaming`). Same
  * mechanism MemoryStream uses; lives here because
  * `internalCreateDataFrame` is `private[sql]`. */
object StreamingDf {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd
    cs.internalCreateDataFrame(rdd, df.schema, isStreaming = true)
  }

  /** The inverse: a V1 `Sink.addBatch` frame is bound to the streaming
    * incremental execution (its logical plan `isStreaming`, so the normal
    * batch write path refuses it). Rebinding the executed RDD as a
    * non-streaming frame lets the engine's ordinary append/overwrite run —
    * the same mechanism Delta's sink uses on its microbatches. */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd
    cs.internalCreateDataFrame(rdd, df.schema, isStreaming = false)
  }
}
