package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.table.LakeTable

/** Streaming ingestion: Structured Streaming file source → graft table sink
  * (SURVEY §2.11; reference: notebooks/01_bronze_ingestion.py:210-229,
  * src/data_processor.py:182-197, migration/migrate_from_s3.py:164-194).
  *
  * The reference uses Databricks Auto Loader (`cloudFiles`); the open-source
  * stand-in is Spark's file source, which has the same incremental
  * file-discovery semantics (`maxFilesPerTrigger` rate limiting, checkpointed
  * file ledger). The sink side is `foreachBatch` into [[LakeTable]], made
  * exactly-once by idempotent (txnAppId, epochId) commits — a replayed batch
  * after a crash is a no-op ([[LakeTable.appendStream]]).
  *
  * Scale notes: the file source lists only new files per trigger and the
  * ledger is O(files seen); each micro-batch is a normal distributed write.
  * Nothing here collects to the driver.
  */
object StreamIngest {

  /** Config mirroring the reference's streaming_config (src/config.py:40-46).
    * `mergeSchema` = cloudFiles addNewColumns parity: batches whose schema
    * has new columns evolve the sink table instead of failing. */
  case class StreamConfig(
      format: String = "json", // json | parquet | csv | orc
      maxFilesPerTrigger: Int = 100,
      trigger: Trigger = Trigger.ProcessingTime(0L),
      options: Map[String, String] = Map.empty,
      mergeSchema: Boolean = false)

  /** `readStream` over a file directory with an enforced schema (S11). */
  def fileSource(
      spark: SparkSession,
      path: String,
      schema: StructType,
      config: StreamConfig = StreamConfig()): DataFrame = {
    val r = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", config.maxFilesPerTrigger)
      .options(config.options)
    config.format match {
      case "json"    => r.json(path)
      case "parquet" => r.parquet(path)
      case "csv"     => r.option("header", "true").csv(path)
      case "orc"     => r.orc(path)
      case f         => throw new IllegalArgumentException(s"unsupported stream format: $f")
    }
  }

  /** Start a stream writing into `table` exactly-once (W7). `transform` is the
    * per-batch cleansing hook (the reference's processing_func,
    * src/data_processor.py:120-121). The txn app id is derived from the
    * checkpoint location, which is what survives restarts. */
  def startFileToTable(
      source: DataFrame,
      table: LakeTable,
      checkpointDir: String,
      config: StreamConfig = StreamConfig(),
      transform: DataFrame => DataFrame = identity,
      queryName: String = ""): StreamingQuery = {
    val appId = txnAppIdFor(checkpointDir)
    val w = transform(source).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(config.trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        table.appendStream(batch, appId, epochId, mergeSchema = config.mergeSchema): Unit
      }
    (if (queryName.nonEmpty) w.queryName(queryName) else w).start()
  }

  /** One call = reference's `start_streaming_ingestion`
    * (notebooks/01_bronze_ingestion.py:204-234): source dir → table. */
  def ingest(
      spark: SparkSession,
      sourcePath: String,
      schema: StructType,
      table: LakeTable,
      checkpointDir: String,
      config: StreamConfig = StreamConfig(),
      transform: DataFrame => DataFrame = identity): StreamingQuery =
    startFileToTable(fileSource(spark, sourcePath, schema, config),
      table, checkpointDir, config, transform)

  /** Streaming CDC upsert (the Delta foreachBatch-merge pattern: a change
    * stream applied to a table as MERGE per micro-batch). Each batch is
    * reduced to its latest row per `keyCols` (by `sequenceCol` descending
    * when given — CDC sequence/LSN — else an arbitrary batch row), then
    * merged: matched keys update, new keys insert, and when `deleteCol`
    * names a boolean source column, rows with it true delete the matched
    * target row (and are never inserted). Exactly-once under epoch replay
    * via the same (txnAppId, epochId) ledger as [[LakeTable.appendStream]]
    * — see [[graft.table.MergeBuilder.withTxn]].
    *
    * Scale: each micro-batch pays one merge — source-bounded file pruning
    * keeps the rewrite proportional to the touched key range, so a keyed
    * (e.g. date-bucketed) CDC stream touches only its hot slice. */
  def startUpsertStream(
      source: DataFrame,
      table: LakeTable,
      checkpointDir: String,
      keyCols: Seq[String],
      sequenceCol: Option[String] = None,
      deleteCol: Option[String] = None,
      config: StreamConfig = StreamConfig(),
      queryName: String = ""): StreamingQuery = {
    require(keyCols.nonEmpty, "streaming upsert requires at least one key column")
    val appId = txnAppIdFor(checkpointDir)
    import org.apache.spark.sql.functions._
    val w = source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(config.trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val latest = sequenceCol match {
          case Some(seq) =>
            val win = org.apache.spark.sql.expressions.Window
              .partitionBy(keyCols.map(col): _*).orderBy(col(seq).desc)
            batch.withColumn("__rn", row_number().over(win))
              .filter(col("__rn") === 1).drop("__rn")
          case None => batch.dropDuplicates(keyCols)
        }
        val cond = keyCols.map(k => col(s"target.$k") === col(s"source.$k"))
          .reduce(_ && _)
        val b = table.merge(latest, cond).withTxn(appId, epochId)
        (deleteCol match {
          case Some(d) =>
            b.whenMatchedDelete(Some(coalesce(col(s"source.$d"), lit(false))))
              .whenMatchedUpdateAll()
              .whenNotMatchedInsertAll(Some(!coalesce(col(s"source.$d"), lit(false))))
          case None => b.whenMatchedUpdateAll().whenNotMatchedInsertAll()
        }).execute(): Unit
      }
    (if (queryName.nonEmpty) w.queryName(queryName) else w).start()
  }

  /** Dedup-at-ingest — the steady-state corpus-build pattern: each
    * micro-batch is deduplicated against the PERSISTED fingerprint index
    * (plus within itself, lowest id wins) and the survivors append to BOTH
    * the corpus table and the index inside the same foreachBatch, so the
    * next batch sees them. First-arrival-wins across batches; with
    * id-ordered arrival this equals [[graft.dedup.Dedup.incrementalExact]]'s
    * lowest-id contract corpus-wide.
    *
    * Exactly-once: the two appends ride (txnAppId, epochId) idempotence
    * with DISTINCT app ids — a replayed batch no-ops on each table
    * independently, so a crash between the corpus append and the index
    * append replays into "corpus no-op + index append" and converges.
    *
    * Scale: per batch one anti-join against the index (~50 B/doc, scanned
    * — never driver-collected) and two appends; already-ingested text is
    * never re-read. At 100 TB store the index bucketed on `fp` so the
    * per-batch probe co-partitions instead of shuffling the index. */
  def startDedupIngest(
      source: DataFrame,
      corpus: LakeTable,
      index: LakeTable,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      config: StreamConfig = StreamConfig(),
      queryName: String = ""): StreamingQuery = {
    val appId = txnAppIdFor(checkpointDir)
    val w = source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(config.trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val survivors = graft.dedup.Dedup.incrementalExact(
          batch, index.read(), idCol, textCol)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          corpus.appendStream(survivors, s"$appId-corpus", epochId)
          index.appendStream(
            graft.dedup.Dedup.fingerprints(survivors, idCol, textCol),
            s"$appId-index", epochId): Unit
        } finally { survivors.unpersist(): Unit }
      }
    (if (queryName.nonEmpty) w.queryName(queryName) else w).start()
  }

  /** BM25-index-at-ingest — the production shape for a continuously
    * ingested searchable corpus: each micro-batch appends to BOTH the
    * corpus table and the persisted BM25 inverted index
    * ([[graft.text.TextAnalysis.buildBm25Index]]) inside the same
    * foreachBatch, so the next search sees it. Only the batch tokenizes —
    * the corpus is never re-read.
    *
    * Exactly-once: the corpus append rides the (txnAppId, epochId) ledger
    * ([[LakeTable.appendStream]]); the index append rides the SAME epoch
    * through [[graft.text.TextAnalysis.appendBm25Batch]]'s batchId — one
    * atomic commit carrying postings AND the corpus-stats property
    * advance, so a replayed epoch no-ops on both tables and the stats
    * advance exactly once. A crash between the two appends replays into
    * "corpus no-op + index append" and converges.
    *
    * Scale: per batch one tokenize + one bucket-partitioned append;
    * search cost is unchanged (partition-pruned probe). */
  def startBm25Ingest(
      source: DataFrame,
      corpus: LakeTable,
      index: LakeTable,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      config: StreamConfig = StreamConfig(),
      queryName: String = ""): StreamingQuery = {
    val appId = txnAppIdFor(checkpointDir)
    val w = source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(config.trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          corpus.appendStream(b, s"$appId-corpus", epochId)
          graft.text.TextAnalysis.appendBm25Batch(index, b, idCol, textCol,
            batchId = Some(s"$appId-index"), batchVersion = epochId)
        } finally { b.unpersist(): Unit }
      }
    (if (queryName.nonEmpty) w.queryName(queryName) else w).start()
  }

  /** Auto Loader schema-location parity (cloudFiles.schemaLocation +
    * inferColumnTypes, notebooks/01_bronze_ingestion.py:213-214): infer the
    * schema from the files present, persist it under `schemaLocation`, and
    * reuse it on restarts — the stream's schema is stable while it runs.
    *
    * With `evolve` (cloudFiles addNewColumns parity), every (re)start
    * re-infers from the current files and UNIONS new columns into the
    * persisted schema — the same restart-based evolution contract as Auto
    * Loader, whose running stream also never changes schema mid-query; pair
    * with `StreamConfig(mergeSchema = true)` so the sink table evolves too.
    * Existing column types are never changed, only new columns appended. */
  def inferOrLoadSchema(
      spark: SparkSession,
      sourcePath: String,
      format: String,
      schemaLocation: String,
      evolve: Boolean = false): StructType = {
    val file = Paths.get(schemaLocation, "_graft_schema.json")
    def parse(bytes: Array[Byte]): StructType =
      org.apache.spark.sql.types.DataType.fromJson(
        new String(bytes, StandardCharsets.UTF_8)).asInstanceOf[StructType]
    def persist(schema: StructType, replace: Boolean): StructType = {
      Files.createDirectories(file.getParent)
      val tmp = Files.createTempFile(file.getParent, ".schema", ".tmp")
      Files.write(tmp, schema.json.getBytes(StandardCharsets.UTF_8))
      if (replace) {
        Files.move(tmp, file, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } else {
        try Files.move(tmp, file, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { // concurrent starter won; use its schema
          case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp)
        }
      }
      parse(Files.readAllBytes(file))
    }
    (Files.exists(file), evolve) match {
      case (true, false) => parse(Files.readAllBytes(file))
      case (true, true) =>
        val persisted = parse(Files.readAllBytes(file))
        val inferred = graft.ingest.BatchIngest.format(spark, format, sourcePath).schema
        val newCols = inferred.fields.filterNot(f =>
          persisted.fieldNames.exists(_.equalsIgnoreCase(f.name)))
        if (newCols.isEmpty) persisted
        else persist(StructType(persisted.fields ++ newCols), replace = true)
      case (false, _) =>
        persist(graft.ingest.BatchIngest.format(spark, format, sourcePath).schema,
          replace = false)
    }
  }

  /** Stable per-checkpoint transaction app id: created once next to the
    * checkpoint, reread on restart — so a restarted query keeps its identity
    * and replayed epochs dedupe. */
  private[streaming] def txnAppIdFor(checkpointDir: String): String = {
    val marker = Paths.get(checkpointDir, "_graft_txn_app_id")
    if (Files.exists(marker))
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8).trim
    else {
      Files.createDirectories(marker.getParent)
      val id = java.util.UUID.randomUUID().toString
      try {
        Files.write(marker, id.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        id
      } catch { // concurrent starter won the race; use its id
        case _: java.nio.file.FileAlreadyExistsException =>
          new String(Files.readAllBytes(marker), StandardCharsets.UTF_8).trim
      }
    }
  }
}
