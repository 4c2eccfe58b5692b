package graft.migrate

import graft.table.LakeTable

/** Shared plumbing for FOLLOWABLE rewrite destinations — the
  * convert/sync/cut-over story for sources the in-place mirrors refuse
  * for data-layout reasons (transform-partitioned Iceberg, partitioned
  * Delta). Both [[IcebergImport.syncRewrite]] and
  * [[DeltaImport.syncRewrite]] key incremental catch-up on the same row
  * LINEAGE columns and enforce the same divergence discipline. */
private[graft] object Rewrite {

  /** Lineage columns a followable rewrite adds to every row: the source
    * data file (source-root-relative), the row's physical position in it,
    * and — Iceberg only — its data SEQUENCE number (what later equality
    * deletes gate on; Delta has no sequence axis). The syncs key
    * source-side removes and row-level deletes on these. Ordinary
    * columns: they survive OPTIMIZE/ZORDER compaction. */
  val SrcFileCol = "_src_file"
  val SrcPosCol = "_src_pos"
  val SrcSeqCol = "_src_seq"

  /** Transaction-ledger app ids marking the syncs' own commits — both the
    * replay-idempotency key (txnVersion = the target source ordinal) and
    * how the divergence guard tells sync commits from local DML. */
  val AppendAppId = "graft-rwsync-append"
  val RemoveAppId = "graft-rwsync-rm"
  val PosDelAppId = "graft-rwsync-pd"
  val EqDelAppId = "graft-rwsync-eq"
  val AppIdPrefix = "graft-rwsync"

  /** The ledger-snapshot directory under a followable destination. */
  val LedgerDir = "_graft_import"

  /** Local DML on a rewrite destination is the cut-over moment, exactly
    * like the in-place mirrors — but unlike them, ROW-PRESERVING file
    * reorganizations (OPTIMIZE/ZORDER/REORG) are fine: the syncs key on
    * lineage COLUMNS, which compaction carries through. Allowed commits:
    * the import/sync's own (txn app id marker), CREATE TABLE, the
    * file-set-neutral housekeeping set, and OPTIMIZE/REORG. */
  def requireNotDiverged(dest: LakeTable, destDir: String): Unit = {
    val rowPreserving = Set("OPTIMIZE", "REORG")
    val diverging = dest.snapshot().commits.filterNot { c =>
      c.operation == "CREATE TABLE" ||
        SyncGuard.FileSetNeutralOps(c.operation) ||
        rowPreserving(c.operation) ||
        c.operationParameters.get("txnAppId").exists(_.startsWith(AppIdPrefix))
    }
    require(diverging.isEmpty,
      s"graft-side commit(s) ${diverging.map(c =>
        s"v${c.version} ${c.operation}").mkString(", ")} changed this " +
        "rewrite destination's rows — local DML is the cut-over moment; " +
        "the table can no longer mirror its source (re-import into a " +
        "fresh directory to keep syncing)")
  }
}
