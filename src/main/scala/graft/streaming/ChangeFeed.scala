package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

import graft.table.LakeTable

/** Incremental batch processing over the Change Data Feed with a version
  * checkpoint (SURVEY §2.11 last row; reference:
  * notebooks/05_time_travel_demo.py:328-372 — "process_incremental_changes"
  * reads CDF from the last processed version and persists the new high-water
  * mark). Stream-like batch: each `processOnce` call hands the caller one
  * DataFrame of changes since the checkpoint, and advances the checkpoint
  * only after the handler returns, so a crashed run reprocesses (at-least-
  * once; make the handler idempotent — e.g. appendStream — for effective
  * exactly-once).
  */
class ChangeFeed(table: LakeTable, checkpointFile: String) {

  private val path = Paths.get(checkpointFile)

  /** Last processed table version, or None before the first run. */
  def lastProcessedVersion: Option[Long] =
    if (Files.exists(path))
      Some(new String(Files.readAllBytes(path), StandardCharsets.UTF_8).trim.toLong)
    else None

  private def writeCheckpoint(v: Long): Unit = {
    Files.createDirectories(path.toAbsolutePath.getParent)
    val tmp = Files.createTempFile(path.toAbsolutePath.getParent, ".cfck", ".tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Pending changes (CDF rows in (lastProcessed, latest]) without advancing
    * the checkpoint; None when already caught up. */
  def pending(): Option[(DataFrame, Long)] = {
    val latest = table.version
    val from = lastProcessedVersion.map(_ + 1).getOrElse(0L)
    if (from > latest) None
    else Some((table.changes(from, Some(latest)), latest))
  }

  /** Run `handler` on the pending changes, then advance the checkpoint.
    * Returns the number of versions processed (0 = caught up). */
  def processOnce(handler: DataFrame => Unit): Long = {
    pending() match {
      case None => 0L
      case Some((df, upTo)) =>
        val from = lastProcessedVersion.map(_ + 1).getOrElse(0L)
        handler(df)
        writeCheckpoint(upTo)
        upTo - from + 1
    }
  }
}
