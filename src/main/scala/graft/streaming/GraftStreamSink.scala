package graft.streaming

import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.execution.streaming.runtime.StreamExecution
import org.apache.spark.sql.graft.StreamingDf
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

import graft.table.LakeTable

/** V1 streaming sink for graft tables — the engine behind
  * `df.writeStream.format("graft").start(path)` and (through the catalog
  * table's V1 fallback) `df.writeStream.toTable("g.ns.t")`, the reference's
  * primary streaming-write spelling (src/data_processor.py:191-197,
  * notebooks/01_bronze_ingestion.py:223-229, migrate_from_s3.py:185-191).
  *
  * Exactly-once comes from the same (txnAppId, txnVersion) commit ledger the
  * foreachBatch path uses ([[LakeTable.appendStream]]): the app id is the
  * streaming query id (stable across restarts of the same checkpoint), the
  * txn version is the epoch id, and a replayed epoch is a no-op re-checked
  * inside the commit-retry loop. Append mode appends; Complete mode is an
  * idempotent full overwrite per epoch. Update mode is rejected (same
  * contract as Delta's sink — a keyed upsert is MERGE's job, see
  * [[StreamIngest.cdcUpsert]]).
  */
class GraftStreamSink(
    spark: SparkSession,
    path: String,
    partitionCols: Seq[String],
    outputMode: OutputMode,
    options: Map[String, String]) extends Sink {

  private def txnAppId: String =
    options.getOrElse("txnAppId",
      Option(spark.sparkContext.getLocalProperty(StreamExecution.QUERY_ID_KEY))
        .getOrElse(throw new IllegalStateException(
          "graft sink: no streaming query id on this thread and no txnAppId option")))

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    // the incoming frame is bound to the incremental execution; rebind as
    // a batch frame so the engine's normal staged-write path accepts it
    val batch: DataFrame = StreamingDf.asBatch(spark, data.toDF())
    val table =
      if (LakeTable.isTable(path)) LakeTable.forPath(spark, path)
      else LakeTable.create(spark, path, batch.schema, partitionCols)
    val mergeSchema = options.get("mergeSchema").contains("true")
    if (outputMode == OutputMode.Append())
      table.appendStream(batch, txnAppId, batchId, mergeSchema): Unit
    else if (outputMode == OutputMode.Complete())
      table.overwriteStream(batch, txnAppId, batchId): Unit
    else throw new UnsupportedOperationException(
      s"graft sink does not support $outputMode output mode; use Append or " +
        "Complete (keyed upserts go through foreachBatch + MERGE)")
  }

  override def toString: String = s"GraftStreamSink[$path]"
}
