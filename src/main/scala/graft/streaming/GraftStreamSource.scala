package graft.streaming

import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.log.{AddFile, CommitInfo, DeletionVector, RemoveFile}
import graft.table.LakeTable

/** Structured-Streaming source over a graft table — the `spark.readStream
  * .format("delta")` analogue (reference src/streaming_utils.py streams
  * INTO tables; Delta users equally stream FROM them):
  *
  * {{{
  * spark.readStream.format("graft").load(path)            // snapshot + appends
  *   .option("startingVersion", 3)                        // appends from v3 on
  *   .option("ignoreChanges", "true")                     // tolerate rewrites
  *   .option("ignoreDeletes", "true")                     // skip delete-only commits
  * }}}
  *
  * Offsets are table VERSIONS (one long per micro-batch checkpoint): the
  * first batch serves the full snapshot at the stream-start version, every
  * later batch reads exactly the files ADDED by versions `(last, end]` —
  * incremental work is proportional to new data, never to table size, and
  * restart-safe because version ranges are deterministic against the
  * immutable log. Commit classification mirrors Delta's source contract:
  * OPTIMIZE commits are pure rewrites and always skipped; UPDATE / DELETE /
  * MERGE / overwrite commits fail the stream unless `ignoreChanges` accepts
  * re-emitting the rewritten files' rows (downstream dedups by key) or, for
  * remove-only commits, `ignoreDeletes` skips them.
  *
  * The stream serves the stream-start schema; additive evolution upstream
  * keeps working (new columns are simply not selected), dropping a served
  * column fails the stream — same behavior Delta documents.
  */
class GraftStreamSource(
    spark: SparkSession,
    table: LakeTable,
    options: Map[String, String],
    metadataPath: String = "") extends Source {

  private val startingVersion: Option[Long] = options.get("startingVersion").map(_.toLong)
  private val ignoreChanges = options.get("ignoreChanges").contains("true")
  private val ignoreDeletes = options.get("ignoreDeletes").contains("true")

  /** readChangeFeed=true streams row-level CHANGES instead of table rows
    * (Delta's streaming CDF): each batch is `changes((last, end])` with
    * `_change_type` / `_commit_version` / `_commit_timestamp`. Without
    * `startingVersion`, the stream serves changes committed AFTER stream
    * start ("from now on"); with it, history from that version. DML
    * versions written without the CDF table property fail the batch with
    * the same message the batch CDF reader gives. */
  private val readChangeFeed = options.get("readChangeFeed").contains("true")

  /** Schema is fixed per RUN (snapshot at source creation): mid-run
    * additive evolution keeps serving these columns (getBatch conforms by
    * name; pre-evolution files read missing columns as NULL), and a
    * RESTART picks up the table's evolved schema — Delta's documented
    * restart behavior. The V1 contract computes the plan schema via
    * `sourceSchema` outside the metadata path, so cross-run pinning is
    * not expressible here; per-run consistency is what the engine
    * asserts and what sinks rely on. */
  override val schema: StructType =
    if (readChangeFeed) table.cdfReadSchema else table.snapshot().schema

  private def toLong(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = Some(LongOffset(table.version))

  /** AddFiles a streaming reader must emit for ONE committed version. */
  private def addsFor(v: Long): Seq[AddFile] = {
    val actions = table.log.readVersion(v)
    val op = actions.collectFirst { case ci: CommitInfo => ci.operation }.getOrElse("")
    val adds = actions.collect { case a: AddFile => a }
    // dv/* tombstones ride every DV commit; the DeletionVector actions are
    // the real data-change signal
    val dataRemoves = actions.collect {
      case r: RemoveFile if !r.path.startsWith("dv/") => r }
    val dvChanged = actions.exists(_.isInstanceOf[DeletionVector])
    if (op == "OPTIMIZE") Nil // dataChange=false: same rows, new files
    else if (dataRemoves.isEmpty && !dvChanged) adds // pure append / metadata
    else if (ignoreChanges) adds
    else if (adds.isEmpty && ignoreDeletes) Nil
    else throw new IllegalStateException(
      s"streaming source saw a data-changing $op commit at version $v; " +
        "set ignoreChanges=true to re-emit rewritten rows " +
        "(or ignoreDeletes=true for remove-only commits)")
  }

  private def appendsBetween(from: Long, to: Long): DataFrame =
    table.readFilesAs((from to to).flatMap(addsFor), schema)

  /** Changes in [from, endV] as CDF rows; empty frame on an empty range. */
  private def changesBetween(from: Long, endV: Long): DataFrame =
    if (from > endV) table.emptyCdfFrame
    else table.changes(from, Some(endV))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = toLong(end)
    val batch = (start.map(toLong), readChangeFeed) match {
      case (Some(s), true) => changesBetween(s + 1, endV)
      case (None, true) => changesBetween(startingVersion.getOrElse(endV + 1), endV)
      case (Some(s), false) => appendsBetween(s + 1, endV)
      case (None, false) => startingVersion match {
        case Some(sv) => appendsBetween(sv, endV)
        case None => table.read(version = Some(endV)) // initial snapshot
      }
    }
    val conformed = batch.select(schema.fieldNames.toIndexedSeq
      .map(org.apache.spark.sql.functions.col): _*)
    org.apache.spark.sql.graft.StreamingDf.asStreaming(spark, conformed)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftStreamSource[${table.dir}]"
}
