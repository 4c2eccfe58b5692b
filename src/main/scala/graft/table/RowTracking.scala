package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.log._

/** Row tracking: stable, table-unique row ids that survive file rewrites
  * (our take on the public Delta Lake `rowTracking` feature; the reference
  * pipeline has no row identity below the business key, which is exactly
  * why incremental consumers there re-derive matches by MERGE key —
  * src/delta_utils.py merge paths).
  *
  * Model
  *  - Every live data file carries [[graft.log.AddFile.baseRowId]]; row i
  *    of the file (physical `_metadata.row_index`) has fresh id
  *    `baseRowId + i` UNLESS the file materializes ids in a
  *    [[RowTracking.MatRowId]] column — rewrites (OPTIMIZE / Z-ORDER)
  *    copy ids through that column, so compaction does not disturb
  *    identity. `defaultRowCommitVersion` (with a [[RowTracking.MatRcv]]
  *    override) is the "row last changed at" version.
  *  - Ids are allocated from a monotonic high-water mark persisted in the
  *    `graft.rowTracking` domain ([[graft.log.DomainMetadata]]): REMOVE of
  *    a file never frees its ids (the domain survives the files), so an id
  *    observed once can never mean a different row later.
  *  - ALL DML preserves ids. DV paths mask files in place (stability by
  *    construction; re-appended post-image rows carry their ids as
  *    materialized columns). Rewrite paths — UPDATE, DELETE, and every
  *    MERGE variant (low-shuffle, DV low-shuffle, general full-outer) —
  *    read resolved ids and materialize them into the rewritten files:
  *    updated rows keep their id with a bumped commit version, copies
  *    keep both, inserts carry null materialized values and resolve to
  *    the staged file's fresh base range. A file may MIX preserved and
  *    fresh rows safely: the fallback `baseRowId + row_index` always
  *    stays inside the file's own allocated range, so a fresh row can
  *    never collide with a preserved id from another range.
  *
  * Scale: id assignment is pure driver arithmetic on the commit's AddFile
  * actions (O(#files), no job); the read path resolves ids from
  * `_metadata.row_index` plus a BROADCAST per-file base map keyed by the
  * file NAME (globally unique by construction — staged writes embed a
  * fresh UUID dir and part-file names), so a 100 TB scan pays one
  * broadcast hash join against an O(#files) map and no shuffle.
  */
trait RowTrackingSupport { self: LakeTable =>

  import RowTracking._

  /** Is row tracking on for these (normalized) table properties? */
  private[table] def rowTrackingOn(props: Map[String, String]): Boolean =
    props.get("graft.enableRowTracking").contains("true")

  def rowTrackingEnabled: Boolean = rowTrackingOn(snapshot().metadata.properties)

  /** Current-version read with the row-identity columns `_row_id` and
    * `_row_commit_version` appended (Delta surfaces the same pair through
    * `_metadata.row_id`/`row_commit_version`). Deletion-vector masks apply
    * first, so masked rows never surface and survivors keep their ids. */
  def withRowIds(version: Option[Long] = None): DataFrame = {
    val snap = snapshot(version)
    require(rowTrackingOn(snap.metadata.properties),
      s"row tracking is not enabled on $dir (set graft.enableRowTracking=true)")
    val unassigned = snap.files.filter(_.baseRowId == null)
    require(unassigned.isEmpty,
      s"row tracking enabled but ${unassigned.size} file(s) lack baseRowId on $dir — " +
        "corrupt enable commit (backfill is part of enabling)")
    resolveRowIds(snap, snap.files)
  }

  /** Position-carrying read with resolved id columns: `files` read under
    * `snap`'s schema + the materialized-id columns (files written before
    * materialization read them as null — parquet missing-column
    * semantics), DV masks applied, and [[RowTracking.MatRowId]]/
    * [[RowTracking.MatRcv]] rewritten to each row's RESOLVED id and
    * commit version (materialized wins over `baseRowId + row_index`).
    * Keeps `__file`/`__idx` so DV DML can keep masking; rewrite paths
    * drop them and write the resolved columns straight through. */
  private[table] def posWithRowIds(snap: Snapshot, files: Seq[AddFile],
      readSchema: StructType = null): DataFrame = {
    // MERGE reads under its (possibly evolved) effective schema
    val logical = Option(readSchema).getOrElse(snap.schema)
    val matSchema = StructType(logical.fields ++ Seq(
      StructField(MatRowId, LongType), StructField(MatRcv, LongType)))
    resolveIdCols(readFilesMaskedPos(snap, files, matSchema), files)
  }

  /** Rewrite a position-carrying frame's [[RowTracking.MatRowId]]/
    * [[RowTracking.MatRcv]] columns to each row's RESOLVED id and commit
    * version via the broadcast per-file base map (materialized value wins
    * over `baseRowId + row_index`). The frame must carry `__file`/`__idx`
    * and the two materialized columns; masking (or not) is the caller's
    * choice — CDF's deletion-vector delta legs resolve ids for rows that
    * ARE masked. */
  private[table] def resolveIdCols(withPos: DataFrame, files: Seq[AddFile]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val names = files.map(f => fileName(f.path))
    require(names.distinct.size == names.size,
      s"duplicate data-file names in $dir — cannot key the row-id map by name")
    val baseMap = files.map { f =>
      (fileName(f.path), Option(f.baseRowId).map(_.toLong).getOrElse(-1L),
        Option(f.defaultRowCommitVersion).map(_.toLong).getOrElse(-1L))
    }.toDF(FnameCol, BaseCol, DcvCol)
    withPos
      .withColumn(FnameCol, element_at(split(col("__file"), "/"), -1))
      .join(broadcast(baseMap), Seq(FnameCol))
      .withColumn(MatRowId, coalesce(col(MatRowId), col(BaseCol) + col("__idx")))
      .withColumn(MatRcv, coalesce(col(MatRcv), col(DcvCol)))
      .drop(FnameCol, BaseCol, DcvCol)
  }

  /** `files` read under `snap`'s schema + materialized-id columns, DV
    * masks applied, with `_row_id`/`_row_commit_version` resolved
    * (materialized wins over computed). Internal columns are dropped. */
  private[table] def resolveRowIds(snap: Snapshot, files: Seq[AddFile]): DataFrame =
    posWithRowIds(snap, files)
      .drop("__file", "__idx")
      .withColumnRenamed(MatRowId, "_row_id")
      .withColumnRenamed(MatRcv, "_row_commit_version")

  /** Should this rewrite carry ids through? On iff tracking is enabled and
    * every input file has an assigned base (always true after the enable
    * commit's backfill — the guard covers half-corrupt states). */
  private[table] def rowsTracked(snap: Snapshot, files: Seq[AddFile]): Boolean =
    rowTrackingOn(snap.metadata.properties) && files.forall(_.baseRowId != null)
}

private[table] object RowTracking {
  /** The row-tracking domain and its single JSON field. */
  val Domain = "graft.rowTracking"
  /** Physical (parquet-only) column names a rewrite materializes ids into;
    * never part of the logical schema, invisible to plain reads. */
  val MatRowId = "_graft_mat_row_id"
  val MatRcv = "_graft_mat_row_commit_version"
  private[table] val FnameCol = "__rt_fname"
  private[table] val BaseCol = "__rt_base"
  private[table] val DcvCol = "__rt_dcv"

  def fileName(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i < 0) path else path.substring(i + 1)
  }

  def highWaterMark(snap: Snapshot): Long =
    snap.domains.get(Domain)
      .flatMap("""\"rowIdHighWaterMark\"\s*:\s*(-?\d+)""".r
        .findFirstMatchIn(_).map(_.group(1).toLong))
      .getOrElse(-1L)

  def domainAction(hwm: Long): DomainMetadata =
    DomainMetadata(Domain, s"""{"rowIdHighWaterMark":$hwm}""")

  /** Commit-time id assignment (called from commitWithRetry per attempt,
    * so a lost CAS race re-assigns against the fresh snapshot): every new
    * AddFile without a baseRowId gets the next id range; files re-emitted
    * with ids intact (RESTORE, CLONE, backfill) keep them and only advance
    * the high-water mark. Any LIVE file still lacking ids (the table
    * predates enablement) is backfilled by re-emitting its AddFile with
    * fresh ids — metadata-only, the bytes never move. Returns the
    * augmented action list, domain update included. */
  def assign(snap: Snapshot, actions: Seq[Action], v: Long): Seq[Action] = {
    val hwm0 = highWaterMark(snap)
    var hwm = hwm0
    val touched = actions.collect {
      case a: AddFile => a.path
      case r: RemoveFile => r.path
    }.toSet
    val backfill = snap.files.filter(f => f.baseRowId == null && !touched.contains(f.path))
    val out = (actions ++ backfill).map {
      case a: AddFile if a.baseRowId == null =>
        val assigned = a.copy(baseRowId = hwm + 1, defaultRowCommitVersion = v)
        // an empty file still occupies one id so base ranges stay disjoint
        // (matching the preserved-file accounting below) — two empty files
        // in one commit must not share a baseRowId
        hwm += math.max(a.numRecords, 1L)
        assigned
      case a: AddFile =>
        hwm = math.max(hwm, a.baseRowId + math.max(a.numRecords, 1L) - 1)
        a
      case x => x
    }
    if (hwm != hwm0 || snap.domains.get(Domain).isEmpty) out :+ domainAction(hwm)
    else out
  }
}
