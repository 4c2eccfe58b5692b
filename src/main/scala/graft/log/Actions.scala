package graft.log

import com.fasterxml.jackson.annotation.JsonInclude
import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Transaction-log actions for the graft table format.
  *
  * The format is "a transaction log over Parquet": each table version is one
  * JSON file of newline-delimited actions under `<table>/_txlog/`, and data
  * lives in immutable Parquet files referenced by `add` actions. This is our
  * own implementation of the ideas in the public Delta Lake protocol spec
  * (reference repo relies on the Delta library, which is unavailable here —
  * see SURVEY.md §7.1); reference usage: src/delta_utils.py,
  * notebooks/04_acid_operations.py.
  *
  * Per-column file statistics ride on every `add` so scans can skip files
  * (min/max pruning — the same mechanism the reference leans on via
  * OPTIMIZE ZORDER, src/delta_utils.py:295-335).
  */
sealed trait Action

/** Column stats are string-encoded; the table schema's dataType drives
  * decode + ordering at prune time (see Stats.scala). */
case class ColStats(min: String, max: String, nullCount: Long)

/** `bloom`: column name → relative path of the per-file bloom sidecar
  * under `_bloom/` (see [[BloomFilter]]); null/absent when the table has no
  * bloom-indexed columns (and for files written by older versions).
  * `tags`: free-form provenance (Delta's AddFile.tags shape) — today the
  * single `clusteredBy = "<curve>:<cols>"` tag written by OPTIMIZE
  * ZORDER/CLUSTER BY and clustered ingest, which lets a later OPTIMIZE
  * skip files already in curve order for the same column set (incremental
  * clustering). Null/absent on files from older versions and plain writes. */
case class AddFile(
    path: String, // relative to table root
    partitionValues: Map[String, String],
    size: Long,
    numRecords: Long,
    stats: Map[String, ColStats],
    modificationTime: Long,
    bloom: Map[String, String] = null,
    tags: Map[String, String] = null) extends Action {
  def tag(key: String): Option[String] = Option(tags).flatMap(_.get(key))
}

case class RemoveFile(path: String, deletionTimestamp: Long) extends Action

case class Metadata(
    id: String,
    name: String,
    schemaJson: String,
    partitionColumns: Seq[String],
    properties: Map[String, String],
    createdTime: Long) extends Action

/** `userName`/`isBlindAppend` mirror Delta's DESCRIBE HISTORY identity
  * columns (the reference surfaces the full history frame,
  * src/delta_utils.py:168-174). Defaults keep pre-existing log files
  * readable: missing JSON fields deserialize to null.
  *
  * `commitId`: a writer-unique id for THIS logical commit (same value
  * across CAS retries of it). It is what makes an ambiguous CAS outcome
  * recoverable: an object store's conditional PUT can land and then report
  * failure (response timeout; SDK-internal retry observing its own first
  * attempt as a 412) — the writer re-reads the version file and recognizes
  * its own commit by this id instead of double-committing the same actions
  * at the next version. Delta's S3 LogStores carry a txn id for the same
  * reason. Null on commits from older log versions and bare tryCommit
  * callers (creation commits), which never retry and need no recovery. */
case class CommitInfo(
    version: Long,
    timestamp: Long,
    operation: String,
    operationParameters: Map[String, String],
    operationMetrics: Map[String, Long],
    readVersion: Long,
    userName: String = null,
    isBlindAppend: java.lang.Boolean = null,
    commitId: String = null) extends Action

/** CDF sidecar parquet file (relative path) carrying the commit's row-level
  * changes with a `_change_type` column; written by UPDATE/DELETE/MERGE.
  * Commits without sidecars synthesize CDF rows from add/remove actions. */
case class CdfFile(path: String, numRecords: Long) extends Action

/** Deletion vector for one data file: `dvPath` (relative) is a parquet file
  * of (__file, __idx) pairs — the masked physical row indexes, keyed by the
  * reader-reported file path. The LAST DeletionVector for a `forFile` wins
  * (vectors are cumulative — a new one carries all masked indexes); an empty
  * `dvPath` clears the vector. A RemoveFile for `forFile` also drops it.
  * This is our take on the Delta deletion-vector idea: DELETE marks rows
  * instead of rewriting files — at 100 TB the difference between a few KB
  * of masks and rewriting every touched file. */
case class DeletionVector(forFile: String, dvPath: String, numDeleted: Long) extends Action

/** Forward-compatibility gate (the Delta protocol action): a reader must
  * support `minReaderVersion` to resolve snapshots, a writer must support
  * `minWriterVersion` to commit — an engine that doesn't fails LOUDLY
  * instead of silently mis-reading a table written with features it does
  * not understand. Tables created before this action existed default to
  * (1, 1). [[Protocol.SupportedReader]]/[[Protocol.SupportedWriter]] are
  * what THIS library implements; `upgradeProtocol` raises a table's
  * requirement once a future feature depends on it. */
case class Protocol(minReaderVersion: Int, minWriterVersion: Int) extends Action

object Protocol {
  val SupportedReader = 1
  val SupportedWriter = 1
  val Current: Protocol = Protocol(SupportedReader, SupportedWriter)
}

/** Envelope for one NDJSON line. Exactly one field is set. */
private[log] case class ActionEnvelope(
    add: AddFile = null,
    remove: RemoveFile = null,
    metaData: Metadata = null,
    commitInfo: CommitInfo = null,
    cdf: CdfFile = null,
    deletionVector: DeletionVector = null,
    protocol: Protocol = null)

object Actions {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    // numbers inside Map[String, Long] would otherwise deserialize as
    // Integer (erasure) and crash on unbox
    m.configure(DeserializationFeature.USE_LONG_FOR_INTS, true)
    m.setSerializationInclusion(JsonInclude.Include.NON_NULL)
    m
  }

  def toJson(a: Action): String = a match {
    case x: AddFile    => mapper.writeValueAsString(ActionEnvelope(add = x))
    case x: RemoveFile => mapper.writeValueAsString(ActionEnvelope(remove = x))
    case x: Metadata   => mapper.writeValueAsString(ActionEnvelope(metaData = x))
    case x: CommitInfo => mapper.writeValueAsString(ActionEnvelope(commitInfo = x))
    case x: CdfFile    => mapper.writeValueAsString(ActionEnvelope(cdf = x))
    case x: DeletionVector => mapper.writeValueAsString(ActionEnvelope(deletionVector = x))
    case x: Protocol   => mapper.writeValueAsString(ActionEnvelope(protocol = x))
  }

  def fromJson(line: String): Action = {
    val e = mapper.readValue(line, classOf[ActionEnvelope])
    if (e.add != null) e.add
    else if (e.remove != null) e.remove
    else if (e.metaData != null) e.metaData
    else if (e.commitInfo != null) e.commitInfo
    else if (e.cdf != null) e.cdf
    else if (e.deletionVector != null) e.deletionVector
    else if (e.protocol != null) e.protocol
    else throw new IllegalArgumentException(s"unrecognized action: $line")
  }
}
