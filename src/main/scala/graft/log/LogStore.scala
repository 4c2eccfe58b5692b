package graft.log

import java.nio.file.{Files, FileAlreadyExistsException, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Pluggable storage primitive for the transaction log — the seam an
  * object-store implementation drops into, mirroring delta-storage's
  * LogStore architecture (one class per store, selected at runtime).
  *
  * The contract every implementation must honor:
  *   - [[listFileNames]]: a complete listing of the log directory's file
  *     names (commit ordering is derived from the names, so the listing
  *     must not silently drop entries);
  *   - [[read]]: the full lines of one log file;
  *   - [[writeAtomic]]: publish `body` at `path` such that (a) readers
  *     never observe a partial file, and (b) with `overwrite = false` the
  *     call returns false iff `path` already exists — the put-if-absent
  *     compare-and-swap that makes version claiming safe under concurrent
  *     writers. This is the ONLY primitive the commit protocol's
  *     correctness rests on.
  *
  * Implementations by storage class:
  *   - [[LocalLogStore]] (the default): POSIX filesystems and HDFS —
  *     temp file + hard-link CAS, see below.
  *   - S3: [[S3LogStore]] — `writeAtomic(overwrite = false)` maps to a
  *     conditional PUT (`If-None-Match: *`, which S3 exposes natively
  *     since Nov 2024); the production binding is a five-call SDK adapter
  *     over [[S3ObjectClient]]. Before conditional writes, OSS Delta
  *     shipped the same seam backed by a DynamoDB lock table
  *     (delta-storage-s3-dynamodb). Either strategy plugs in here without
  *     touching the protocol.
  *   - GCS / ADLS: atomic rename exists, so the local strategy carries
  *     over with rename in place of hard links.
  */
trait LogStore {
  def listFileNames(dir: Path): Seq[String]
  /** Names under `dir` strictly AFTER `startAfter` (lexicographic) — the
    * tail listing behind the `_last_checkpoint` fast path. The default
    * filters a full listing (correct everywhere); object-store
    * implementations override with the native start-after parameter
    * (S3 ListObjectsV2 `StartAfter`) so resolving the latest snapshot of
    * a long-history table lists O(tail) names, not O(history). Same
    * completeness contract as [[listFileNames]]. */
  def listFileNamesAfter(dir: Path, startAfter: String): Seq[String] =
    listFileNames(dir).filter(_ > startAfter)
  def read(path: Path): Seq[String]
  /** Raw bytes of one log object — the binary twin of [[read]], for the
    * metadata objects that are not line-oriented (Avro manifests, Iceberg
    * metadata JSON, parquet checkpoints read driver-side). No text-based
    * default: a wrapper store that only forwards [[read]] would silently
    * corrupt binary objects (UTF-8 round-trip + newline splitting), so a
    * store that does not implement bytes fails LOUDLY at the call site. */
  def readBytes(path: Path): Array[Byte] =
    throw new UnsupportedOperationException(
      s"${getClass.getName} does not implement readBytes — binary log " +
        "objects (Avro/parquet/JSON metadata) cannot round-trip through " +
        "the line-oriented read()")
  def writeAtomic(path: Path, body: Array[Byte], overwrite: Boolean): Boolean
  /** Remove one log object (DROP FEATURE ... TRUNCATE HISTORY's boundary
    * sweep); true iff it existed. Never part of the commit CAS — deletes
    * only ever target files strictly below a verified checkpoint. */
  def delete(path: Path): Boolean
  /** Last-modified epoch millis of one log object, when the store can say
    * (local: file mtime; S3: HeadObject/ListObjectsV2 LastModified;
    * in-memory: the tracked put time). None when unknown or absent —
    * callers gating a DELETE on age must treat unknown as "too recent"
    * (skip), never as "old enough". */
  def modifiedMillis(path: Path): Option[Long] = None
}

/** Local-filesystem implementation: write a temp file in the log dir, then
  * publish with `Files.createLink` — hard-link creation fails atomically
  * with `FileAlreadyExistsException` when the target exists, which IS the
  * put-if-absent CAS (same inode trick delta-standalone uses on HDFS via
  * rename-without-overwrite). Overwrite mode (checkpoints, idempotent
  * content) publishes with an atomic rename instead. */
object LocalLogStore extends LogStore {

  def listFileNames(dir: Path): Seq[String] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
    finally s.close()
  }

  def read(path: Path): Seq[String] =
    Files.readAllLines(path, java.nio.charset.StandardCharsets.UTF_8).asScala.toSeq

  override def readBytes(path: Path): Array[Byte] = Files.readAllBytes(path)

  def writeAtomic(path: Path, body: Array[Byte], overwrite: Boolean): Boolean = {
    Files.createDirectories(path.getParent)
    val tmp = Files.createTempFile(path.getParent, s".${path.getFileName}-", ".tmp")
    try {
      Files.write(tmp, body)
      if (overwrite) {
        Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        true
      } else {
        try { Files.createLink(path, tmp); true }
        catch { case _: FileAlreadyExistsException => false }
      }
    } finally { Files.deleteIfExists(tmp): Unit }
  }

  def delete(path: Path): Boolean = Files.deleteIfExists(path)

  override def modifiedMillis(path: Path): Option[Long] =
    scala.util.Try(Files.getLastModifiedTime(path).toMillis).toOption
}

object LogStore {
  /** Store used by every [[TxLog]] that does not receive an explicit one.
    * Swap at startup to route ALL log IO through another storage class. */
  @volatile var default: LogStore = LocalLogStore
}
