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

  /** Admission control (Delta's maxFilesPerTrigger/maxBytesPerTrigger):
    * with either cap set, offsets become (version, fileIndex) positions so
    * one micro-batch serves at most the cap — the initial snapshot of a
    * 100 TB table arrives as many bounded batches instead of one monster
    * batch. Without caps, offsets stay plain versions (legacy format;
    * existing checkpoints keep working, and a capped restart understands
    * a legacy checkpoint). Byte caps admit at least one file per batch so
    * a single oversized file cannot stall the stream. */
  private val maxFilesPerTrigger: Option[Int] =
    options.get("maxFilesPerTrigger").map(_.toInt)
  private val maxBytesPerTrigger: Option[Long] =
    options.get("maxBytesPerTrigger").map(_.toLong)
  maxFilesPerTrigger.foreach(v =>
    require(v > 0, s"maxFilesPerTrigger must be positive, got $v"))
  maxBytesPerTrigger.foreach(v =>
    require(v > 0, s"maxBytesPerTrigger must be positive, got $v"))
  private val rateLimited = maxFilesPerTrigger.nonEmpty || maxBytesPerTrigger.nonEmpty
  require(!(rateLimited && readChangeFeed),
    "maxFilesPerTrigger/maxBytesPerTrigger do not apply to readChangeFeed streams")

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

  // ------------------------------------------------ rate-limited positions

  /** A position in the stream's deterministic file sequence: the snapshot
    * unit (files of snapshot(snapVersion), path-sorted) when
    * `version == snapVersion`, else the adds of `version` in log order;
    * `index` files of the current unit are already served. `snapVersion`
    * is -1 for startingVersion streams (no snapshot unit). */
  private case class Pos(version: Long, index: Int, snapVersion: Long) {
    def json: String =
      s"""{"version":$version,"index":$index,"snapVersion":$snapVersion}"""
  }

  private val posRe =
    """\{"version":(-?\d+),"index":(\d+),"snapVersion":(-?\d+)\}""".r

  /** Parse either offset format; a legacy long offset means "version v
    * fully served (snapshot included)". */
  private def toPos(o: Offset): Pos = o.json.trim match {
    case posRe(v, i, sv) => Pos(v.toLong, i.toInt, sv.toLong)
    case s => Pos(s.toLong + 1, 0, -1L)
  }

  /** The snapshot unit is immutable per version — memoize it so the
    * per-trigger capped walk doesn't replay the log every getOffset while
    * a large snapshot is being served in chunks. */
  @volatile private var snapUnitCache: (Long, Seq[AddFile]) = (-1L, Nil)

  private def unitFiles(pos: Pos): Seq[AddFile] =
    if (pos.version == pos.snapVersion) {
      if (snapUnitCache._1 != pos.snapVersion)
        snapUnitCache =
          (pos.snapVersion, table.snapshot(Some(pos.snapVersion)).files.sortBy(_.path))
      snapUnitCache._2
    } else addsFor(pos.version)

  /** Walk forward from `from`, admitting whole files until a cap (or the
    * log end) is hit; exhausted units normalize to (version+1, 0) so a
    * position is always within its unit's bounds. */
  private def capped(from: Pos): Pos = {
    val latest = table.version
    val maxF = maxFilesPerTrigger.getOrElse(Int.MaxValue)
    val maxB = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    var (v, i) = (from.version, from.index)
    var files = 0
    var bytes = 0L
    var full = false
    while (v <= latest && !full) {
      val unit = unitFiles(Pos(v, i, from.snapVersion))
      while (i < unit.size && !full) {
        val f = unit(i)
        if (files > 0 && (files + 1 > maxF || bytes + f.size > maxB)) full = true
        else { files += 1; bytes += f.size; i += 1 }
      }
      if (!full && i >= unit.size) { v += 1; i = 0 }
    }
    Pos(v, i, from.snapVersion)
  }

  /** Last position handed to Spark (WAL-logged by the engine). After a
    * restart whose final batch committed, the V1 API gives the source no
    * start position at getOffset time — [[walEnd]] recovers it from the
    * checkpoint's own offsets log so catch-up batches stay capped; only
    * if the WAL is unreadable does the first batch fall back to serving
    * the whole backlog (it must never regress behind the unknown
    * committed position). */
  private var lastEnd: Option[Pos] = None

  /** Newest WAL-logged end offset for THIS source, read from the
    * checkpoint's offsets log (format: "v1", metadata json, then one
    * offset line per source — the source index is this metadata dir's
    * name). An uncommitted newest entry is equally safe to resume from:
    * the engine re-runs that exact batch via getBatch, which re-syncs
    * `lastEnd` before this is ever consulted. */
  private def walEnd(): Option[Pos] = markerPath.flatMap { m =>
    scala.util.Try {
      val dir = m.getParent.getParent.getParent.resolve("offsets")
      val ids = Option(dir.toFile.list()).getOrElse(Array.empty[String])
        .flatMap(n => scala.util.Try(n.toLong).toOption)
      val lines = java.nio.file.Files.readAllLines(dir.resolve(ids.max.toString))
      val srcIdx = scala.util.Try(m.getParent.getFileName.toString.toInt).getOrElse(0)
      val off = lines.get(2 + srcIdx).trim
      require(off != "-")
      toPos(new Offset { override def json: String = off })
    }.toOption
  }

  /** Pinned stream-start snapshot version, persisted as a marker file
    * under the source's metadata path so a capped mode-A restart never
    * re-pins (and re-serves) a fresh snapshot. */
  private def markerPath: Option[java.nio.file.Path] =
    if (metadataPath.isEmpty) None
    else {
      // strip a URI scheme by hand: checkpoint paths may contain spaces,
      // which URI.create rejects (Hadoop does not percent-encode them)
      val raw = metadataPath.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", "")
      Some(java.nio.file.Paths.get(raw).resolve("graft-stream-start"))
    }

  /** True when this checkpoint has offsets from a previous run — the
    * engine knows a committed position this source object does not. */
  private def hasRunBefore: Boolean = {
    val markerSeen = markerPath.exists(java.nio.file.Files.exists(_))
    val offsetsSeen = (for (m <- markerPath) yield {
      val offsets = m.getParent.getParent.getParent.resolve("offsets")
      java.nio.file.Files.isDirectory(offsets) && {
        val s = java.nio.file.Files.list(offsets)
        try s.iterator().hasNext finally s.close()
      }
    }).getOrElse(false)
    markerSeen || offsetsSeen
  }

  /** A torn/corrupt marker (crash mid-write) parses to None — treated as
    * "unknown snapshot version", never a stream-killing exception. */
  private def readMarker(): Option[Long] =
    markerPath.filter(java.nio.file.Files.exists(_)).flatMap(p =>
      scala.util.Try(
        new String(java.nio.file.Files.readAllBytes(p)).trim.toLong).toOption)

  /** Atomic first-wins marker write: temp file + ATOMIC_MOVE, so no crash
    * can leave a half-written marker behind. */
  private def writeMarker(v: Long): Unit = markerPath.foreach { p =>
    import java.nio.file.{Files, StandardCopyOption}
    Files.createDirectories(p.getParent)
    if (!Files.exists(p)) {
      val tmp = Files.createTempFile(p.getParent, ".marker-", ".tmp")
      try {
        Files.write(tmp, v.toString.getBytes)
        try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      } finally { Files.deleteIfExists(tmp): Unit }
    }
  }

  private def rateLimitedOffset(): Option[Offset] = {
    val end = lastEnd match {
      case Some(last) => capped(last)
      case None if hasRunBefore =>
        // committed restart: recover the engine's position from its own
        // offsets log and keep capping; if the WAL is unreadable, offer
        // everything (getBatch still receives the true committed start)
        walEnd() match {
          case Some(committed) => capped(committed)
          case None => Pos(table.version + 1, 0, readMarker().getOrElse(-1L))
        }
      case None =>
        val start = startingVersion match {
          case Some(sv) => Pos(sv, 0, -1L)
          case None => val v0 = table.version; Pos(v0, 0, v0)
        }
        writeMarker(start.snapVersion)
        capped(start)
    }
    lastEnd = Some(end)
    Some(new Offset { override def json: String = end.json })
  }

  override def getOffset: Option[Offset] =
    if (rateLimited) rateLimitedOffset() else Some(LongOffset(table.version))

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

  /** Files in positions [st, end): snapshot-unit files (served masked, the
    * snapshot's DVs apply) separated from appended-version files (served
    * as written, matching the uncapped contract). */
  private def filesBetween(st: Pos, end: Pos): (Seq[AddFile], Seq[AddFile]) = {
    val snapBuf = Seq.newBuilder[AddFile]
    val addBuf = Seq.newBuilder[AddFile]
    var v = st.version
    var i = st.index
    while (v < end.version || (v == end.version && i < end.index)) {
      val unit = unitFiles(Pos(v, i, end.snapVersion))
      val hi = if (v == end.version) math.min(end.index, unit.size) else unit.size
      val chunk = unit.slice(i, hi)
      if (v == end.snapVersion) snapBuf ++= chunk else addBuf ++= chunk
      v += 1
      i = 0
    }
    (snapBuf.result(), addBuf.result())
  }

  private def positionalBatch(start: Option[Offset], endP: Pos): DataFrame = {
    val stP = start.map(toPos).getOrElse(
      if (endP.snapVersion >= 0) Pos(endP.snapVersion, 0, endP.snapVersion)
      else Pos(startingVersion.getOrElse(endP.version), 0, -1L))
    val (snapChunk, addChunk) = filesBetween(stP, endP)
    val added = table.readFilesAs(addChunk, schema)
    if (snapChunk.isEmpty) added
    else table.readFilesMasked(
      table.snapshot(Some(endP.snapVersion)), snapChunk, schema)
      .unionByName(added)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val batch = if (end.json.trim.startsWith("{")) {
      val endP = toPos(end)
      lastEnd = Some(endP) // WAL recovery path: re-sync the capped cursor
      positionalBatch(start, endP)
    } else if (start.exists(_.json.trim.startsWith("{"))) {
      // caps removed on a capped checkpoint: finish from the positional
      // start through endV as one positional batch
      val stP = toPos(start.get)
      positionalBatch(start, Pos(toLong(end) + 1, 0, stP.snapVersion))
    } else {
      val endV = toLong(end)
      (start.map(toLong), readChangeFeed) match {
        case (Some(s), true) => changesBetween(s + 1, endV)
        case (None, true) => changesBetween(startingVersion.getOrElse(endV + 1), endV)
        case (Some(s), false) => appendsBetween(s + 1, endV)
        case (None, false) => startingVersion match {
          case Some(sv) => appendsBetween(sv, endV)
          case None => table.read(version = Some(endV)) // initial snapshot
        }
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
