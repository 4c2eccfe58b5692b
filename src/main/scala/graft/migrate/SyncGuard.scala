package graft.migrate

import graft.log.CommitInfo

/** The shared cut-over guard for continuous-migration syncs (Delta and
  * Iceberg alike): a mirror table must not have taken graft-side writes
  * that could change the live file set since its last sync point — a
  * source-side remove of a locally rewritten path would be dropped by the
  * live-set filter while the source-side replacement add still landed,
  * silently duplicating rows. Local DML is the cut-over moment. */
private[migrate] object SyncGuard {

  /** Graft operations that cannot change the live data-file set AND leave
    * the table still able to mirror its source. Audited against every
    * commit operation string LakeTable/Dml/Maintain emit (ADVICE r12: the
    * original list refused constraint/default/feature commits that were
    * actually safe, permanently breaking the mirror for no reason).
    * Deliberately ABSENT: schema-shape ops (ADD/RENAME/DROP COLUMN,
    * ALTER COLUMN TYPE, generated/identity columns) — they are metadata-
    * only too, but a locally-evolved mirror can no longer follow the
    * source (and must never be mistaken for SOURCE-side evolution), so
    * divergence is the honest refusal; REORG/OPTIMIZE change the file set
    * outright, and DROP FEATURE shares one operation name between its
    * metadata-only form and the TRUNCATE HISTORY form that can REWRITE
    * stale-typed files (typeWidening), so it stays out too. */
  val FileSetNeutralOps: Set[String] = Set(
    "CONVERT", "DELTA SYNC", "ICEBERG SYNC", "VACUUM", "ANALYZE", "GENERATE",
    "SET TBLPROPERTIES", "UNSET TBLPROPERTIES", "UPGRADE PROTOCOL",
    "ADD FEATURE", "ADD CONSTRAINT", "DROP CONSTRAINT",
    "ALTER COLUMN DEFAULT")

  /** CHECK constraints cannot be enforced on FOREIGN files: graft
    * validates constraints inside its own write jobs, but a sync imports
    * the source's files zero-copy — a violating foreign row would land
    * silently, breaking addConstraint's readers-never-see-bad-rows
    * guarantee (ADD CONSTRAINT itself is file-set-neutral and keeps the
    * mirror open; it is the next file-ADDING sync that must refuse).
    * Removal-only and metadata-only syncs stay safe. Called inside the
    * commit CAS closure — a constraint landing mid-sync refuses too. */
  def requireNoConstraintsForAdds(properties: Map[String, String],
      newFiles: Long, sourceKind: String): Unit =
    if (newFiles > 0) {
      val cs = properties.keys.filter(_.startsWith("graft.constraints."))
        .toSeq.sorted
      require(cs.isEmpty,
        s"this mirror declares CHECK constraint(s) ${cs.map(
          _.stripPrefix("graft.constraints.")).mkString(", ")} which " +
          s"cannot be validated on files a $sourceKind sync imports " +
          "zero-copy — drop the constraint(s) or cut over")
    }

  /** Refuse when any commit after the last sync point (`syncOps`) is not
    * file-set-neutral. Called at sync entry for a fast loud failure AND
    * inside the commit CAS closure — the retry loop re-resolves the
    * snapshot, so a local write landing in between refuses instead of
    * duplicating (TOCTOU). */
  def requireNotDiverged(commits: Seq[CommitInfo], syncOps: Set[String],
      sourceKind: String): Unit = {
    val syncPoint = commits.filter(c => syncOps.contains(c.operation))
      .map(_.version).maxOption.getOrElse(-1L)
    val diverging = commits.filter(_.version > syncPoint)
      .filterNot(c => FileSetNeutralOps(c.operation))
    require(diverging.isEmpty,
      s"graft-side commit(s) ${diverging.map(c =>
        s"v${c.version} ${c.operation}").mkString(", ")} changed the " +
        s"table since the last $sourceKind sync — local writes are the " +
        "cut-over moment; this table can no longer mirror the source " +
        "(re-import into a fresh directory to keep syncing)")
  }
}
