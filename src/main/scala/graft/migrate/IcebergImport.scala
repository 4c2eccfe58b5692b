package graft.migrate

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.log.{AddFile, ColStats, ColumnIds, CommitInfo, Stats, TxLog}
import graft.table.LakeTable

/** Zero-copy import of an Apache Iceberg table (HadoopTables layout —
  * `metadata/v<N>.metadata.json` + Avro manifest lists/manifests): the
  * remaining interop quadrant. [[graft.table.Uniform]] exports TO Iceberg;
  * this replays Iceberg metadata INTO a graft table in place, sharing every
  * data file — so an exported table round-trips, and a foreign Iceberg
  * table migrates without a rewrite. [[sync]] then follows the source's
  * NEW snapshots until cut-over, exactly like [[DeltaImport.sync]].
  *
  * Replayed state (Iceberg table spec, format versions 1 and 2): the
  * current metadata file (version-hint.text, else the highest
  * `v<N>.metadata.json`), its current snapshot's manifest list, each DATA
  * manifest's live entries (status != DELETED), and each DELETE manifest's
  * position-delete files — which transcode into the engine's own
  * deletion-vector masks (one Spark read of (file_path, pos) rows,
  * aggregated into per-file roaring bitmaps, never a driver-side position
  * explosion). v1's legacy metadata keys and missing Avro fields read as
  * their spec defaults (see [[replay]]).
  *
  * Honest zero-copy scope — refuse rather than silently mis-read, with
  * [[convertRewrite]] as the named remedy where a rewrite CAN honor the
  * semantics:
  *  - identity partition transforms only, on types whose Avro partition
  *    encoding has a faithful string form (string/int/long/date — the set
  *    the exporter writes); identity-partitioned Iceberg data files
  *    CONTAIN their partition columns, so zero-copy stays faithful
  *    (unlike Delta), and the tuples import keyed by the SPEC FIELD name
  *    (a foreign spec may name the field differently from the column);
  *    derived transforms (days/bucket/truncate/…) → convertRewrite;
  *  - equality deletes refuse in place (row-predicate deletes cannot
  *    transcode to position masks without a scan) → convertRewrite
  *    applies them as sequence-gated, partition-scoped anti-joins;
  *    DANGLING position deletes (targets compacted away without a delete
  *    rewrite — spec-valid) are ignored, exactly as Iceberg readers do;
  *  - data files outside the table root refuse, like the Delta importer's
  *    absolute-path rule;
  *  - column binding: Iceberg field ids are never reused, so they are
  *    AUTHORITATIVE regardless of footer names — by-id resolution is safe
  *    precisely when every live footer column carries an id (renames
  *    survive: old files keep the old NAME, the id binds them); id-less
  *    files fall back to BY NAME, refusing unknown footer columns.
  *
  * Stats: record counts come from the manifests and are CROSS-CHECKED
  * against the parquet footers; min/max bounds are re-derived from footers
  * (exact by construction) rather than trusted from manifests — the
  * Iceberg spec allows truncated (loose) bounds, which are safe for
  * skipping but would poison graft's metadata-only EXACT min/max answers.
  * ONE parallel footer pass (stats + field ids together) buys exactness
  * forever. */
object IcebergImport {

  private val plain = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Table properties recording the consumed source state: the source's
    * last-sequence-number (monotonic — the sync ordering key) and the
    * metadata version it was read from. */
  val SourceSeqKey = "graft.iceberg.sourceSequence"
  val SourceMetaVersionKey = "graft.iceberg.sourceMetadataVersion"

  /** Metadata IO rides [[graft.log.LogStore.default]] (the engine's store
    * seam); data/delete parquet and footer reads are data-plane Spark /
    * Hadoop-FS IO, object-store capable by construction. */
  private def store: graft.log.LogStore = graft.log.LogStore.default

  def isIcebergTable(dir: String): Boolean =
    store.listFileNames(Paths.get(dir, "metadata")).exists(n =>
      n == "version-hint.text" || n.matches(raw"v\d+\.metadata\.json"))

  /** One partition-spec field: the spec FIELD name (which keys the
    * manifest partition tuple), the source column, and the transform. */
  private[migrate] case class PartField(
      specName: String, column: String, transform: String)

  /** One equality-delete file: absolute (scheme-stripped) path, its data
    * sequence number (equality deletes apply to data files with a STRICTLY
    * smaller sequence), the equality field ids it matches on, the manifest's
    * partition spec id, and the entry's partition tuple (spec field name →
    * string value, sorted; null values kept as null) — the spec scopes a
    * partitioned-spec delete to its own partition, while an unpartitioned-
    * spec delete applies table-wide. */
  private[migrate] case class EqDelete(
      path: String, seq: Long, equalityIds: Seq[Int],
      specId: Long, tuple: Seq[(String, String)])

  /** The replayed current state of an Iceberg table's metadata. */
  private[migrate] case class IcebergState(
      metaVersion: Long,
      meta: java.util.Map[String, Object],
      lastSeq: Long,
      formatVersion: Long,
      schemaWithIds: StructType,
      partFields: Seq[PartField],
      live: Seq[(String, GenericRecord)], // (relative path, data_file record)
      liveSeq: Map[String, Long], // relative path -> data sequence number
      liveScope: Map[String, (Long, Seq[(String, String)])], // path -> (spec id, tuple)
      specFields: Map[Long, Seq[PartField]], // spec id -> its fields (ALL specs)
      deletePaths: Seq[String], // position-delete parquet (manifest form)
      eqDeletes: Seq[EqDelete]) {
    def pcols: Seq[String] = partFields.map(_.column)
    def specSize(specId: Long): Int = specFields.get(specId).map(_.size).getOrElse(0)
  }

  /** The zero-copy imports' honesty gates over partition transforms,
    * equality deletes, and partition-value string fidelity — everything
    * [[convertRewrite]] CAN handle but an in-place import cannot. */
  private def gateZeroCopy(root: Path, st: IcebergState): Unit = {
    st.partFields.foreach { pf =>
      require(pf.transform == "identity",
        s"partition transform '${pf.transform}' is not identity — derived " +
          "partition values cannot import as layout columns; import with " +
          "convertRewrite (one scan, rewritten into graft layout)")
    }
    require(st.eqDeletes.isEmpty,
      s"$root carries EQUALITY deletes — predicate deletes cannot " +
        "transcode to position masks; import with convertRewrite (they " +
        "apply as an anti-join during the rewrite)")
    // graft's partition values are strings cast back to the column type;
    // only types with a faithful string round-trip from the Avro encoding
    // import (the same set the exporter writes)
    st.pcols.foreach { c =>
      val dt = st.schemaWithIds.fields.find(_.name == c).get.dataType
      require(dt match {
        case StringType | LongType | IntegerType | ShortType | ByteType |
             DateType => true
        case _ => false
      }, s"identity partition column '$c' has type $dt — its Avro " +
        "partition encoding has no faithful string form in this importer")
    }
  }

  /** Import `<dir>`'s Iceberg metadata as a graft table IN PLACE
    * (idempotent: an already-imported directory returns the existing graft
    * table). */
  def convert(spark: SparkSession, dir: String): LakeTable = {
    if (TxLog.isTable(dir)) return LakeTable.forPath(spark, dir)
    val root = Paths.get(dir).toAbsolutePath.normalize
    val st = replay(root)
    gateZeroCopy(root, st)
    val now = System.currentTimeMillis()

    // ---- column binding + ONE footer pass (ids + exact stats) ----
    val icebergIds: Map[String, Long] = st.schemaWithIds.fields.map(f =>
      f.name -> ColumnIds.idOf(f).get).toMap
    val footers: Map[String, (Long, Map[String, ColStats], Seq[(String, Option[Int])])] =
      if (st.live.isEmpty) Map.empty
      else Stats.fromFootersWithIds(
        st.live.map(p => root.resolve(p._1)), st.schemaWithIds)
    val allIdsPresent = st.live.nonEmpty && st.live.forall { case (p, _) =>
      footers(root.resolve(p).toString)._3.forall(_._2.isDefined)
    }
    val schema =
      if (allIdsPresent) st.schemaWithIds
      else {
        st.live.foreach { case (p, _) =>
          footers(root.resolve(p).toString)._3.foreach { case (name, _) =>
            require(icebergIds.contains(name),
              s"file $p column '$name' is not a schema column and the " +
                "files carry no usable field ids — name-mapping this " +
                "importer cannot resolve; rewrite the table")
          }
        }
        ColumnIds.strip(st.schemaWithIds)
      }
    // stats landed by footer-column NAME, but a by-id import READS by field
    // id — drop any per-file stats entry whose footer column name matches a
    // schema column carrying a DIFFERENT id (Iceberg never reuses ids but
    // MAY reuse a renamed-away name: that footer column's bytes are not
    // what by-id reads return for the same-named schema column, so its
    // min/max/nullCount would silently poison exact metadata-only answers)
    val footersAttr =
      if (!allIdsPresent) footers
      else footers.view.mapValues(dropMisattributedStats(_, icebergIds)).toMap
    val graftAdds: Seq[AddFile] = st.live.map { case (p, df) =>
      toAddFile(st, root, p, df, footersAttr(root.resolve(p).toString), now)
    }

    // ---- position deletes -> graft deletion-vector masks ----
    val liveAbs = graftAdds.map(f => root.resolve(f.path).toString).toSet
    val masks = buildMasks(spark, root, st.deletePaths, liveAbs)
    val dvActions: Seq[graft.log.Action] = masks.toSeq.flatMap {
      case (rel, counts) =>
        graftAdds.flatMap(f => counts.get(root.resolve(f.path).toString)
          .map(n => graft.log.DeletionVector(f.path, rel, n)))
    }

    // ---- one graft commit materializing the snapshot ----
    val properties = Option(st.meta.get("properties"))
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala
        .map { case (k, v) => k -> String.valueOf(v) }.toMap)
      .getOrElse(Map.empty[String, String])
    val maxIdProp: Map[String, String] =
      if (!allIdsPresent) Map.empty
      else Map(ColumnIds.MaxIdKey -> math.max(
        Option(st.meta.get("last-column-id")).map(num).getOrElse(0L),
        ColumnIds.maxId(Map.empty, schema)).toString)
    val metaAction = graft.log.Metadata(
      Option(st.meta.get("table-uuid")).map(_.toString)
        .getOrElse(java.util.UUID.randomUUID().toString),
      root.getFileName.toString, schema.json, st.pcols,
      LakeTable.normalizeProps(properties) ++ sortAndStatsProps(st, root) ++
        maxIdProp +
        (SourceSeqKey -> st.lastSeq.toString) +
        (SourceMetaVersionKey -> st.metaVersion.toString), now)
    val ci = CommitInfo(0L, now, "CONVERT",
      Map("numFiles" -> graftAdds.size.toString,
        "sourceFormat" -> "iceberg",
        "numDeletionVectors" -> dvActions.size.toString,
        "sourceVersion" -> st.metaVersion.toString), Map.empty, -1L,
      LakeTable.currentUser, false, java.util.UUID.randomUUID().toString)
    val proto = graft.log.Protocol.merge(
      graft.log.Protocol.merge(graft.log.Protocol.Current,
        LakeTable.impliedFeatures(metaAction.properties)),
      if (dvActions.isEmpty) graft.log.Protocol.Current
      else graft.log.Protocol(1, 1, null, Seq("deletionVectors")))
    val tlog = new TxLog(root)
    if (!tlog.tryCommit(0L, ci +: proto +: metaAction +: (graftAdds ++ dvActions)))
      return LakeTable.forPath(spark, dir) // lost a concurrent import
    LakeTable.forPath(spark, dir)
  }

  /** Incremental catch-up after [[convert]]: when the source's
    * last-sequence-number advanced, apply the NET difference between its
    * current snapshot and the graft live set as ONE graft commit — new
    * files add zero-copy (footer-verified binding + exact stats, O(new
    * files) only), vanished files remove, and the deletion-vector state
    * REBUILDS from the current position deletes (masks that appeared
    * land, masks that vanished clear; cost O(current masked positions)
    * per sync). The consumed sequence advances in the same commit, so a
    * replay or racing sync no-ops. The continuous-migration shape:
    * convert once, sync on a cadence, cut over when ready.
    *
    * Refusals mirror the Delta sync: graft-side commits that could have
    * changed the live file set (the cut-over guard, re-checked inside the
    * commit CAS), a schema or partition-spec change on the source (the
    * cut-over moment, not a silent sync step). Source table properties do
    * NOT propagate (Iceberg properties rarely map onto graft semantics —
    * set them locally if needed). Returns the graft version. */
  def sync(spark: SparkSession, dir: String): Long = {
    val t = LakeTable.forPath(spark, dir)
    val root = Paths.get(dir).toAbsolutePath.normalize
    // a rewrite destination also carries the consumed-state keys but is
    // NOT an in-place mirror (its source lives elsewhere and its rows are
    // rewritten) — without this gate the failure would be a confusing
    // missing-metadata error on the destination directory
    require(!t.properties.get(RewriteFollowKey).contains("true"),
      s"$dir is a followable REWRITE destination — sync it with " +
        "IcebergImport.syncRewrite(spark, sourceDir, destDir)")
    val consumed = t.properties.get(SourceSeqKey).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"$dir was not imported from Iceberg (no $SourceSeqKey property)"))
    val syncOps = Set("CONVERT", "ICEBERG SYNC")
    SyncGuard.requireNotDiverged(t.snapshot().commits, syncOps, "Iceberg")
    val st = replay(root)
    // staleness is judged on BOTH ordering keys: the sequence number (data
    // commits) and the metadata version (metadata-only commits — a rename
    // writes new metadata WITHOUT a new snapshot, so its sequence does not
    // move; and a v1→v2 format upgrade RESTARTS the sequence axis, which
    // would otherwise stall the mirror silently until the source
    // accumulated `consumed` data commits)
    val consumedMeta = t.properties.get(SourceMetaVersionKey)
      .map(_.toLong).getOrElse(-1L)
    if (st.lastSeq <= consumed && st.metaVersion <= consumedMeta)
      return t.version
    // a source that adopted non-identity transforms or equality deletes
    // since the import can no longer mirror in place (cut-over moment)
    gateZeroCopy(root, st)
    val snap0 = t.snapshot()
    val mapped = ColumnIds.mapped(snap0.schema)
    val incoming =
      if (mapped) st.schemaWithIds else ColumnIds.strip(st.schemaWithIds)
    // r13: SOURCE-side renames (by-id) and added nullable columns are
    // followable — they translate into this sync commit instead of
    // refusing. Drops, type changes, required adds, partition-column
    // renames, and renames on a name-bound import stay cut-over refusals
    // (see [[Evolution]]).
    val evolved = incoming != snap0.schema
    if (evolved)
      Evolution.requireFollowable(snap0.schema, incoming, mapped, "Iceberg")
    // partition-column renames land here too: stale partitionValues keys
    // on existing AddFiles would break exact partition matching
    // (replaceWhere after cut-over), so the spec's COLUMN NAMES must hold
    require(st.pcols == snap0.metadata.partitionColumns,
      s"the Iceberg source's partition spec changed " +
        s"(${st.pcols.mkString(", ")}) — not syncable in place; re-import")
    // partition VALUES are stored as strings re-parsed under the current
    // type: even a widening on a partition column is a cut-over moment
    if (evolved) snap0.metadata.partitionColumns.foreach { c =>
      val of = snap0.schema.fields.find(_.name == c).get
      require(incoming.fields.find(_.name == c).exists(_.dataType == of.dataType),
        s"partition column '$c' changed type — not syncable in place; " +
          "re-import")
    }

    val graftLive: Set[String] = snap0.files.map(_.path).toSet
    val currentLive: Set[String] = st.live.map(_._1).toSet
    val newEntries = st.live.filterNot { case (p, _) => graftLive.contains(p) }
    val removed = (graftLive -- currentLive).toSeq
    // binding gate + exact stats for the NEW files only (O(churn) footers)
    val footers =
      if (newEntries.isEmpty)
        Map.empty[String, (Long, Map[String, ColStats], Seq[(String, Option[Int])])]
      else Stats.fromFootersWithIds(
        newEntries.map(p => root.resolve(p._1)), st.schemaWithIds)
    newEntries.foreach { case (p, _) =>
      val cols = footers(root.resolve(p).toString)._3
      if (mapped) cols.foreach { case (name, id) =>
        require(id.isDefined,
          s"synced file $p column '$name' carries no field id — this " +
            "by-id table cannot bind it; re-import")
      } else cols.foreach { case (name, _) =>
        // bind against the EVOLVED schema: a name-bound source adding a
        // nullable column ships files carrying it in the same commit
        require(incoming.fieldNames.contains(name),
          s"synced file $p column '$name' is not a schema column — " +
            "name-mapping this importer cannot resolve")
      }
    }
    val now = System.currentTimeMillis()
    // same stat-attribution honesty as convert: by-id tables drop stats
    // for footer columns whose name matches a different-id schema column
    val idOfName: Map[String, Long] = st.schemaWithIds.fields.map(f =>
      f.name -> ColumnIds.idOf(f).get).toMap
    val footersAttr =
      if (!mapped) footers
      else footers.view.mapValues(dropMisattributedStats(_, idOfName)).toMap
    // footer stats are re-derived NOW under the current types, so synced
    // files always tag: stats/bloom trust heals on the mirror after a
    // followed lossy widening or name reuse
    val tagSchema =
      if (!evolved) snap0.schema
      else Evolution.mergedSchema(snap0.schema, incoming, mapped,
        snap0.metadata.properties, t.version + 1)._1
    val syncTags: Map[String, String] = tagSchema.fields
      .filter(f => graft.log.TypeWidening.hasChanges(f) ||
        graft.log.TypeWidening.nameReused(f))
      .map(f => graft.log.TypeWidening.tagKey(f) ->
        graft.log.TypeWidening.changeCount(f).toString).toMap
    val newAdds: Seq[AddFile] = newEntries.map { case (p, df) =>
      toAddFile(st, root, p, df, footersAttr(root.resolve(p).toString), now,
        syncTags)
    }
    // rebuild the CURRENT mask state (position deletes are snapshot-global)
    val liveAbs = st.live.map(p => root.resolve(p._1).toString).toSet
    val masks = buildMasks(spark, root, st.deletePaths, liveAbs)
    try {
      t.commitWithRetry("ICEBERG SYNC",
        Map("fromSequence" -> consumed.toString,
          "toSequence" -> st.lastSeq.toString,
          "sourceVersion" -> st.metaVersion.toString),
        snap0,
        Map("numAddedFiles" -> newAdds.size.toLong,
          "numRemovedFiles" -> removed.size.toLong)) { s =>
        // a racing sync already consumed this state (BOTH ordering keys
        // at-or-past — seq alone would false-trigger across a v1→v2
        // upgrade, whose sequence axis restarts): stand down
        if (s.metadata.properties.get(SourceSeqKey)
            .exists(_.toLong >= st.lastSeq) &&
          s.metadata.properties.get(SourceMetaVersionKey)
            .exists(_.toLong >= st.metaVersion))
          throw new LakeTable.EpochAlreadyCommitted
        // TOCTOU re-check: local writes after the entry guard refuse here
        SyncGuard.requireNotDiverged(s.commits, syncOps, "Iceberg")
        SyncGuard.requireNoConstraintsForAdds(s.metadata.properties,
          newAdds.size.toLong, "Iceberg")
        val liveNow = s.files.map(_.path).toSet
        val dvActions: Seq[graft.log.DeletionVector] = masks.toSeq.flatMap {
          case (rel, counts) => st.live.flatMap { case (p, _) =>
            counts.get(root.resolve(p).toString)
              .map(n => graft.log.DeletionVector(p, rel, n))
          }
        }
        val maskedNow = dvActions.map(_.forFile).toSet
        // previously-masked files whose mask vanished: explicit clears
        // (REMOVED files drop their vectors automatically)
        val clears = s.dvs.keys
          .filterNot(maskedNow).filter(currentLive.contains)
          .map(p => graft.log.DeletionVector(p, "", 0L)).toSeq
        // a followable evolution applies onto the CURRENT schema (by field
        // id when mapped), so LOCAL field metadata a file-set-neutral
        // commit stamped meanwhile (a column DEFAULT) survives the sync
        val (mergedJson, retireProp) =
          if (!evolved) (s.metadata.schemaJson, Map.empty[String, String])
          else {
            val (m, rp) = Evolution.mergedSchema(s.schema, incoming, mapped,
              s.metadata.properties, s.version + 1)
            (m.json, rp)
          }
        // an added column raises the field-id high-water mark so graft-side
        // ADD COLUMN after cut-over never reuses a source id
        val maxIdProp: Map[String, String] =
          if (!mapped) Map.empty
          else Map(ColumnIds.MaxIdKey -> math.max(
            Option(st.meta.get("last-column-id")).map(num).getOrElse(0L),
            math.max(
              s.metadata.properties.get(ColumnIds.MaxIdKey)
                .map(_.toLong).getOrElse(0L),
              ColumnIds.maxId(Map.empty, incoming))).toString)
        val metaA = s.metadata.copy(schemaJson = mergedJson,
          properties = s.metadata.properties ++ maxIdProp ++ retireProp +
          (SourceSeqKey -> st.lastSeq.toString) +
          (SourceMetaVersionKey -> st.metaVersion.toString))
        // property-implies-feature, like the Delta sync: a followed
        // widening lands graft.enableTypeWidening WITH its feature
        val proto = graft.log.Protocol.merge(
          graft.log.Protocol.merge(s.protocol,
            LakeTable.impliedFeatures(metaA.properties)),
          if (dvActions.isEmpty) s.protocol
          else graft.log.Protocol(1, 1, null, Seq("deletionVectors")))
        (if (proto == s.protocol) Seq(metaA) else Seq(proto, metaA)) ++
          newAdds ++ dvActions ++ clears ++
          removed.filter(liveNow.contains)
            .map(p => graft.log.RemoveFile(p, now))
      }
    } catch { case _: LakeTable.EpochAlreadyCommitted => () }
    t.version
  }

  // ------------------------------------------------------ rewrite import

  /** Parsed partition transform: name plus the bucket/truncate argument. */
  private def parseTransform(t: String): (String, Int) = t match {
    case b if b.startsWith("bucket[") =>
      ("bucket", raw"bucket\[(\d+)\]".r.findFirstMatchIn(b).map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(s"bad transform '$t'")))
    case w if w.startsWith("truncate[") =>
      ("truncate", raw"truncate\[(\d+)\]".r.findFirstMatchIn(w).map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(s"bad transform '$t'")))
    case other => (other, 0)
  }

  /** Destination layout for one spec field under the rewrite: either the
    * source column itself (identity on a string-faithful type) or a graft
    * GENERATED column mirroring the transform — None when the dimension
    * cannot carry over (void, unknown future transforms, identity on
    * types without a faithful partition-string form, truncate on types
    * beyond string/int/long). Dropping a layout dimension never drops
    * DATA — the source column is always present in the rewritten rows;
    * OPTIMIZE ZORDER can re-cluster the dimension later. */
  private def destPartOf(pf: PartField, src: StructField)
      : Option[(StructField, Option[String])] = {
    val c = s"`${src.name}`"
    def gen(dt: DataType, expr: String): Option[(StructField, Option[String])] =
      Some((StructField(pf.specName, dt), Some(expr)))
    val stringFaithful = src.dataType match {
      case StringType | LongType | IntegerType | ShortType | ByteType |
           DateType => true
      case _ => false
    }
    parseTransform(pf.transform) match {
      case ("identity", _) if stringFaithful => Some((src, None))
      case ("identity", _) => None
      case ("void", _) => None
      case ("year" | "years", _) => gen(IntegerType, s"year($c)")
      case ("month" | "months", _) =>
        gen(StringType, s"date_format($c, 'yyyy-MM')")
      case ("day" | "days", _) => gen(DateType, s"CAST($c AS DATE)")
      case ("hour" | "hours", _) =>
        gen(StringType, s"date_format($c, 'yyyy-MM-dd-HH')")
      case ("bucket", n) =>
        // graft's own hash layout, NOT Iceberg's murmur bucket function —
        // the destination is a fresh native table; only the bucket COUNT
        // and the clustering-by-this-column intent carry over
        gen(IntegerType, s"pmod(hash($c), $n)")
      case ("truncate", w) => src.dataType match {
        case StringType => gen(StringType, s"substring($c, 1, $w)")
        case LongType => gen(LongType, s"$c - ((($c % $w) + $w) % $w)")
        case IntegerType =>
          gen(IntegerType, s"CAST($c - ((($c % $w) + $w) % $w) AS INT)")
        case _ => None
      }
      case _ => None // unknown future transform: data is complete either way
    }
  }

  /** Rewrite-import of an Iceberg table into a NEW graft table at
    * `destDir` — the remedy for everything the zero-copy [[convert]]
    * refuses for data-layout reasons: non-identity partition transforms
    * (`days`/`bucket`/`truncate`/… — the most common real-world Iceberg
    * layouts), equality deletes, and identity partitions on types without
    * a faithful string form. ONE scan reads every live data file (Iceberg
    * data files always CONTAIN their partition source columns — unlike
    * Delta, no tuple re-injection is needed); position deletes drop via a
    * (file, position) anti-join; equality deletes drop via per-key-set
    * anti-joins under the spec's sequence rule (a delete applies only to
    * data files with a STRICTLY smaller data sequence number), delete-file
    * key columns resolved by field id against each delete file's footer.
    * The destination mirrors the source's layout: identity partitions
    * carry over as real partition columns, derived transforms become graft
    * GENERATED partition columns (`days(ts)` -> `CAST(ts AS DATE)`, …) so
    * partition pruning survives the migration. O(data) once — the
    * migration rewrite the in-place refusals point at.
    *
    * With `follow = true` the destination is built to be SYNCABLE by
    * [[syncRewrite]] (r13 verdict task 1 — the convert/sync/cut-over
    * story for transform-partitioned layouts): every rewritten row
    * carries its source-file LINEAGE as two ordinary columns —
    * [[SrcFileCol]] (the source data file, root-relative) and
    * [[SrcPosCol]] (the row's position in it) — the consumed source
    * state records in the table properties, and a full live-set ledger
    * snapshot writes under the destination. Lineage is what later
    * source-side removes and row-level deletes key on; the storage cost
    * (a dictionary-encoded path plus a delta-encoded long per row) is the
    * price of followability, and a one-shot migration should keep the
    * default `follow = false`. */
  def convertRewrite(spark: SparkSession, srcDir: String, destDir: String): LakeTable =
    convertRewrite(spark, srcDir, destDir, follow = false)

  def convertRewrite(spark: SparkSession, srcDir: String, destDir: String,
      follow: Boolean): LakeTable = {
    val root = Paths.get(srcDir).toAbsolutePath.normalize
    val st = replay(root)
    val lay = layoutOf(st)
    val lineageFields =
      if (!follow) Nil
      else {
        Seq(SrcFileCol, SrcPosCol, Rewrite.SrcSeqCol).foreach { n =>
          require(!lay.destSchemaBase.fieldNames.exists(_.equalsIgnoreCase(n)),
            s"source column '$n' collides with the lineage column a " +
              "followable rewrite adds — import with follow = false, or " +
              "rename the source column")
        }
        Seq(StructField(SrcFileCol, StringType),
          StructField(SrcPosCol, LongType),
          StructField(Rewrite.SrcSeqCol, LongType))
      }
    val destSchema = StructType(lay.destSchemaBase.fields ++ lineageFields)
    val properties = Option(st.meta.get("properties"))
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala
        .map { case (k, v) => k -> String.valueOf(v) }.toMap)
      .getOrElse(Map.empty[String, String])
    val followProps: Map[String, String] =
      if (!follow) Map.empty
      else Map(RewriteFollowKey -> "true",
        RewriteSourceKey -> root.toString,
        RewriteSpecKey -> specSignature(st.partFields),
        SourceSeqKey -> st.lastSeq.toString,
        SourceMetaVersionKey -> st.metaVersion.toString)
    val props = LakeTable.normalizeProps(properties) ++ lay.genProps ++ followProps
    // a fully deleted (or never-written) source imports as an empty table —
    // schema and layout are fully known
    if (st.live.isEmpty) {
      if (follow) writeLedger(Paths.get(destDir).toAbsolutePath.normalize, st)
      return LakeTable.create(spark, destDir, destSchema,
        partitionColumns = lay.destPcols, properties = props, ifNotExists = false)
    }
    val typed = rewriteRows(spark, root, st, st.live, lay, follow,
      st.eqDeletes, st.deletePaths)
    // the ledger snapshot writes BEFORE the data commit: a crash in
    // between leaves a stray ledger file (harmless — reads key on the
    // CONSUMED property) but never a synced table without its ledger
    if (follow) writeLedger(Paths.get(destDir).toAbsolutePath.normalize, st)
    // ifNotExists = false: a retried migration fails LOUDLY on the
    // existing destination instead of silently appending twice
    val dest = LakeTable.create(spark, destDir, destSchema,
      partitionColumns = lay.destPcols, properties = props, ifNotExists = false)
    if (follow)
      dest.appendWithProps(typed, _ => Map.empty,
        Some(RwAppendAppId), Some(st.lastSeq)): Unit
    else dest.append(typed): Unit
    dest
  }

  /** Incremental catch-up for a FOLLOWABLE rewrite destination
    * ([[convertRewrite]] with `follow = true`) — the continuous-migration
    * shape for exactly the sources the in-place [[sync]] refuses
    * (days/bucket/truncate layouts, equality-delete streams):
    *
    *  1. source files REMOVED since the last sync (compaction,
    *     copy-on-write deletes) become a lineage-keyed merge-DELETE on
    *     the destination (`_src_file` equality — file stats on the
    *     lineage column prune the touched destination files);
    *  2. NEW position-delete files targeting already-imported rows apply
    *     as a (`_src_file`, `_src_pos`) merge-DELETE;
    *  3. NEW equality-delete files apply to already-imported rows as
    *     key-equality merge-DELETEs, sequence-gated against each row's
    *     [[Rewrite.SrcSeqCol]] lineage (a newly-arrived delete file can
    *     carry an OLD explicit sequence — delete-file compaction — and
    *     must not touch rows whose data postdates it); only table-wide or
    *     implied-by-key scopes apply (a real partition scope against old
    *     data refuses: its tuple does not map onto the rewritten layout);
    *  4. NEW data files rewrite-append through the same batch machinery
    *     as the import (position deletes, sequence-gated and
    *     partition-scoped equality deletes within the batch, generated
    *     partition keys recomputed), advancing the consumed source state
    *     in the SAME commit.
    *
    * Every step is idempotent — the merges and the append ride the
    * transaction ledger keyed by the target sequence, the ledger snapshot
    * is name-keyed by it — so a crash anywhere replays to the same state
    * and a repeated sync no-ops. Unlike the in-place [[sync]] (one net
    * commit), a catch-up is up to four destination commits: each is
    * individually consistent, but a reader BETWEEN them can observe a
    * mid-sync state (e.g. a compacted file's rows removed before their
    * re-append lands); time-travel to the pre-sync version if the read
    * must straddle a sync. Cost is O(churn) + one merge probe per
    * step; the destination may be OPTIMIZE/ZORDER-compacted freely
    * between syncs (lineage rides the rows), while local DML stays the
    * cut-over moment. Returns the destination's version. */
  def syncRewrite(spark: SparkSession, srcDir: String, destDir: String): Long = {
    import org.apache.spark.sql.functions.{col, expr}
    val dest = LakeTable.forPath(spark, destDir)
    val root = Paths.get(srcDir).toAbsolutePath.normalize
    val destRoot = Paths.get(destDir).toAbsolutePath.normalize
    val props0 = dest.properties
    require(props0.get(RewriteFollowKey).contains("true"),
      s"$destDir was not rewrite-imported with follow = true — a one-shot " +
        "rewrite destination carries no source lineage to sync by; " +
        "re-import with convertRewrite(spark, src, dest, follow = true)")
    require(props0.get(RewriteSourceKey).contains(root.toString),
      s"$destDir mirrors ${props0.getOrElse(RewriteSourceKey, "<unset>")}, " +
        s"not $srcDir")
    val consumed = props0(SourceSeqKey).toLong
    val consumedMeta = props0.get(SourceMetaVersionKey).map(_.toLong).getOrElse(-1L)
    Rewrite.requireNotDiverged(dest, destDir)
    val st = replay(root)
    if (st.lastSeq <= consumed && st.metaVersion <= consumedMeta)
      return dest.version
    // schema and partition-spec changes stay cut-over refusals for a
    // rewrite destination (its generated layout and lineage plumbing were
    // derived from the import-time spec)
    val lay = layoutOf(st)
    require(props0.get(RewriteSpecKey).contains(specSignature(st.partFields)),
      s"the Iceberg source's partition spec changed — a rewrite " +
        "destination cannot follow a re-layout; re-import")
    // every lineage column this sync relies on must actually exist — a
    // destination built by an OLDER convertRewrite (before the sequence
    // lineage landed) must refuse loudly up front, not fail mid-sync with
    // an unresolved-column error after merges already committed
    Seq(SrcFileCol, SrcPosCol, Rewrite.SrcSeqCol).foreach { c =>
      require(dest.snapshot().schema.fieldNames.contains(c),
        s"$destDir carries no '$c' lineage column — it was rewritten by " +
          "an older engine version; re-import with convertRewrite(spark, " +
          "src, dest, follow = true) to keep syncing")
    }
    val destDataTypes = dest.snapshot().schema.fields
      .filterNot(f => lay.genFields.exists(_.name.equalsIgnoreCase(f.name)) ||
        f.name == SrcFileCol || f.name == SrcPosCol ||
        f.name == Rewrite.SrcSeqCol)
      .map(f => (f.name, f.dataType)).toSeq
    require(destDataTypes == lay.dataSchema.fields
        .map(f => (f.name, f.dataType)).toSeq,
      s"the Iceberg source's schema changed — this evolution is a " +
        "cut-over moment for a rewrite destination; re-import")

    val prev = readLedger(destRoot, consumed).getOrElse(
      throw new IllegalStateException(
        s"$destDir carries no ledger snapshot for consumed sequence " +
          s"$consumed under ${destRoot.resolve(LedgerDir)} — the " +
          "followable-rewrite state is damaged; re-import"))
    val currentLive = st.live.map(_._1).toSet
    // new data is judged by PATH, not sequence number: a source-side
    // compaction (RewriteDataFiles) writes NEW paths whose entries carry
    // their OLD data sequence numbers (spec: EXISTING entries keep
    // explicit seqs) — a seq > consumed filter would classify them as
    // neither removed-survivors nor new and silently LOSE their rows
    val prevData = prev.dataFiles.toSet
    val newData = st.live.filterNot { case (p, _) => prevData(p) }
    val removed = prev.dataFiles.filterNot(currentLive)
    val newPosDel = st.deletePaths.map(Stats.stripScheme)
      .filterNot(prev.posDeleteFiles.toSet)
    val newEqDel = st.eqDeletes.filterNot(d => prev.eqDeleteFiles.toSet(d.path))
    // eq deletes against ALREADY-IMPORTED data must be table-wide or
    // implied-by-key ([[eqScopeOf]] None): a real partition scope keys on
    // the SOURCE spec tuple, which does not exist on the rewritten rows
    newEqDel.foreach { d =>
      require(eqScopeOf(st, d).isEmpty,
        s"equality-delete file ${d.path} carries a partition scope that " +
          "cannot be applied to already-imported rows (the source tuple " +
          "does not exist on the rewritten layout) — rewrite the deletes " +
          "table-wide on the Iceberg side, or re-import")
    }

    // ledger snapshot for the NEW consumed point, before any mutation
    writeLedger(destRoot, st)

    // 1. removed source files -> lineage-keyed merge-DELETE
    if (removed.nonEmpty) {
      import spark.implicits._
      dest.merge(removed.toDF("rm_file"),
        expr(s"target.`$SrcFileCol` = source.rm_file"))
        .whenMatchedDelete()
        .withTxn(RwRemoveAppId, st.lastSeq)
        .execute(): Unit
    }
    // 2. new position deletes on already-imported rows
    if (newPosDel.nonEmpty) {
      val rootPrefixLen = root.toString.length + 2 // 1-based, past the '/'
      val pd = spark.read.parquet(newPosDel: _*)
        .select(graft.log.DvBitmap.stripPathCol(
          col("file_path").cast(StringType)).as("pd_abs"),
          col("pos").cast(LongType).as("pd_pos"))
        .withColumn("pd_file", expr(s"substring(pd_abs, $rootPrefixLen)"))
        .drop("pd_abs").distinct()
      dest.merge(pd,
        expr(s"target.`$SrcFileCol` = source.pd_file AND " +
          s"target.`$SrcPosCol` = source.pd_pos"))
        .whenMatchedDelete()
        .withTxn(RwPosDelAppId, st.lastSeq)
        .execute(): Unit
    }
    // 3. new equality deletes on already-imported rows: one merge per
    // distinct key set (grouped reads, like the batch path), SEQUENCE-
    // GATED against each destination row's [[Rewrite.SrcSeqCol]] lineage —
    // a newly-arrived delete file can carry an OLD explicit sequence
    // (delete-file compaction writes new paths keeping old sequences,
    // the same EXISTING-entry shape data files have), and an ungated
    // merge would delete rows whose data POSTDATES the delete
    resolveEqDeletes(st, newEqDel).zipWithIndex.foreach {
      case ((srcNames, keyFields, group), i) =>
        import spark.implicits._
        val paths = group.map(_.path).distinct.sorted
        val metaDf = group.map(d => (Paths.get(d.path).toString, d.seq))
          .toDF("__dpath", "__dseq")
        val readSchema = StructType(srcNames.zip(keyFields).map {
          case (n, f) => StructField(n, f.dataType) })
        val keys = spark.read.schema(readSchema).parquet(paths: _*)
          .select(srcNames.zip(keyFields).map { case (n, f) =>
            col(s"`$n`").as(s"eq_${f.name}") } :+
            graft.log.DvBitmap.stripPathCol(
              col("_metadata.file_path")).as("__dpath"): _*)
          .join(org.apache.spark.sql.functions.broadcast(metaDf), "__dpath")
          .groupBy(keyFields.map(f => col(s"`eq_${f.name}`")): _*)
          .agg(org.apache.spark.sql.functions.max("__dseq").as("eq_dseq"))
        dest.merge(keys, (keyFields.map(f =>
            expr(s"target.`${f.name}` <=> source.`eq_${f.name}`")) :+
            expr(s"target.`${Rewrite.SrcSeqCol}` < source.eq_dseq"))
          .reduce(_ && _))
          .whenMatchedDelete()
          // one txn slot per key-set group: group order is deterministic
          // (sorted), so a replay resumes exactly where it crashed
          .withTxn(s"$RwEqDelAppId:$i", st.lastSeq)
          .execute(): Unit
    }
    // 4. new data files rewrite-append + consumed state, one commit
    val advance = Map(SourceSeqKey -> st.lastSeq.toString,
      SourceMetaVersionKey -> st.metaVersion.toString)
    if (newData.nonEmpty) {
      // ALL live eq-deletes, not just the new ones: a compaction-born file
      // keeps its OLD data sequence, so an old delete with a higher seq
      // still applies to it — the per-file sequence gate inside the
      // rewrite makes old deletes a no-op on genuinely new files
      // Position deletes filtered to the NEW files' possible referents:
      // an old delete file cannot reference a PATH that did not exist
      // when it was written, so for genuinely-new files (seq > consumed)
      // only the window's new delete files can match — O(new deletes) IO
      // per sync. A window carrying OLD-sequence files (compaction-born
      // paths, or a RESTORED path an old live delete still targets) reads
      // the full live delete set instead: the compacted-path reads are
      // wasted (anti-join matches nothing) but a restored path's old
      // deletes MUST re-apply — correctness over IO (review r14)
      val windowPosDel =
        if (newData.exists { case (p, _) => st.liveSeq(p) <= consumed })
          st.deletePaths
        else newPosDel
      val typed = rewriteRows(spark, root, st, newData, lay, follow = true,
        st.eqDeletes, windowPosDel)
      dest.appendWithProps(typed, _ => advance,
        Some(RwAppendAppId), Some(st.lastSeq)): Unit
    } else dest.setProperties(advance): Unit
    pruneLedgers(destRoot, consumed)
    dest.version
  }

  /** The destination layout derived from the source's partition spec. */
  private case class RewriteLayout(
      resolvedParts: Seq[(StructField, Option[String])],
      dataSchema: StructType) {
    def genFields: Seq[StructField] = resolvedParts.collect { case (f, Some(_)) => f }
    def genProps: Map[String, String] = resolvedParts.collect {
      case (f, Some(e)) => s"graft.generated.${f.name}" -> e }.toMap
    def destPcols: Seq[String] = resolvedParts.map(_._1.name)
    def destSchemaBase: StructType = StructType(dataSchema.fields ++ genFields)
  }

  private def layoutOf(st: IcebergState): RewriteLayout = {
    val fieldOf = st.schemaWithIds.fields.map(f => f.name -> f).toMap
    val destParts: Seq[(StructField, Option[String])] = st.partFields.flatMap {
      pf => destPartOf(pf, fieldOf(pf.column)) }
    // a generated column name colliding with a schema column gets `_p`
    val taken = scala.collection.mutable.Set(
      st.schemaWithIds.fieldNames.map(_.toLowerCase).toIndexedSeq: _*)
    val resolvedParts: Seq[(StructField, Option[String])] = destParts.map {
      case (f, None) => (f, None) // identity: the schema column itself
      case (f, expr) =>
        var n = f.name
        while (taken.contains(n.toLowerCase)) n = n + "_p"
        taken += n.toLowerCase
        (f.copy(name = n), expr)
    }
    RewriteLayout(resolvedParts, ColumnIds.strip(st.schemaWithIds))
  }

  /** The shared rewrite read: scan `subset` of the live files (binding
    * gate + planned-vs-logged guard on exactly that subset), drop
    * position-deleted rows, apply `eqDeletes` sequence-gated and
    * partition-scoped, project the data columns (plus lineage when
    * `follow`), and repartition by the destination partition keys —
    * without the shuffle a days() layout explodes into #tasks × #days
    * tiny files (measured 51 s / ~76k files vs ~3 s with it; at 100 TB
    * the no-shuffle shape is the scale killer). Follow mode shuffles by
    * (partition keys, [[SrcFileCol]]) so destination files are
    * lineage-CLUSTERED (whole source files per task, modulo hash
    * collisions) — that is what lets the sync's removal merges rewrite
    * only the touched files' descendants instead of the table. */
  private def rewriteRows(spark: SparkSession, root: Path, st: IcebergState,
      subset: Seq[(String, GenericRecord)], lay: RewriteLayout,
      follow: Boolean, eqDeletes: Seq[EqDelete],
      posDeletes: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    // ---- binding: by field id when every subset footer carries ids ----
    val livePaths = subset.map(p => root.resolve(p._1).toString)
    val footIds = Stats.footerFieldIds(subset.map(p => root.resolve(p._1)))
    val allIds = subset.forall { case (p, _) =>
      footIds(root.resolve(p).toString).forall(_._2.isDefined) }
    if (!allIds) subset.foreach { case (p, _) =>
      footIds(root.resolve(p).toString).foreach { case (name, _) =>
        require(st.schemaWithIds.fieldNames.contains(name),
          s"file $p column '$name' is not a schema column and the files " +
            "carry no usable field ids — a by-name rewrite would misread " +
            "renamed columns; rewrite the table on the Iceberg side")
      }
    }
    val readSchema = if (allIds) st.schemaWithIds else lay.dataSchema
    // by-id resolution must hold on ANY session (the refusal message sends
    // users here directly): without this conf Spark resolves by NAME and a
    // renamed column's old files would silently read all-NULL — the same
    // guard LakeTable.readFiles carries
    if (allIds)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val raw = spark.read.schema(readSchema).parquet(livePaths: _*)
      .withColumn("__file",
        graft.log.DvBitmap.stripPathCol(col("_metadata.file_path")))
    // loud pre-write guard (driver-only): every file the scan plans must
    // be a live manifest entry and vice versa — silent divergence here
    // would be data loss
    val planned = raw.inputFiles.map(Stats.stripScheme).toSet
    val logged = livePaths.map(Stats.stripScheme).toSet
    require(planned == logged,
      s"planned scan files diverge from the manifests' live set " +
        s"(only-planned: ${(planned -- logged).take(3)}, " +
        s"only-logged: ${(logged -- planned).take(3)}) — refusing to " +
        "write a silently incomplete import")

    // ---- position deletes: (file, position) anti-join ----
    var cur =
      if (posDeletes.isEmpty && eqDeletes.isEmpty && !follow) raw
      else raw.withColumn("__idx", col("_metadata.row_index"))
    if (posDeletes.nonEmpty) {
      val del = spark.read.parquet(posDeletes.map(Stats.stripScheme): _*)
        .select(graft.log.DvBitmap.stripPathCol(
          col("file_path").cast(StringType)).as("__dfile"),
          col("pos").cast(LongType).as("__didx"))
      cur = cur.join(del,
        cur("__file") === del("__dfile") && cur("__idx") === del("__didx"),
        "left_anti")
    }
    // ---- per-file (sequence, scope) ride the rows: the eq-delete gate
    // needs them, and follow mode persists the sequence as lineage ----
    if (follow || eqDeletes.nonEmpty)
      cur = attachSeqScope(spark, root, st, subset, cur)
    // ---- equality deletes (see [[applyEqualityDeletes]]) ----
    if (eqDeletes.nonEmpty)
      cur = applyEqualityDeletes(spark, root, st, cur, eqDeletes)

    // ---- project + repartition by the destination partition keys ----
    val rootPrefixLen = root.toString.length + 2 // 1-based, past the '/'
    val lineageCols =
      if (!follow) Nil
      else Seq(
        org.apache.spark.sql.functions
          .expr(s"substring(__file, $rootPrefixLen)").as(SrcFileCol),
        col("__idx").as(SrcPosCol),
        col("__seq").as(Rewrite.SrcSeqCol))
    val typed0 = cur.select(
      lay.dataSchema.fieldNames.toIndexedSeq.map(col) ++ lineageCols: _*)
    val partExprs = lay.resolvedParts.map {
      case (f, None) => col(f.name)
      case (_, Some(e)) => org.apache.spark.sql.functions.expr(e)
    }
    // follow mode shuffles by (partition keys, SOURCE FILE) so
    // destination files are lineage-CLUSTERED: each shuffle task holds
    // whole source files (hash collisions can co-locate a FEW sources
    // per task — collisions shrink as files/shuffle-partitions — and the
    // within-partition sort keeps each source's rows contiguous). A
    // removal merge therefore rewrites only the tasks' files that carry
    // the removed source, not the table (a partition-key-only shuffle
    // mixes EVERY source into every file and rewrites everything); the
    // file-count cost is bounded by the source's own file-per-partition
    // overlap, ~1 for partition-aligned real sources
    val shuffleKeys =
      if (follow) partExprs :+ col(SrcFileCol) else partExprs
    val typed =
      if (shuffleKeys.isEmpty) typed0
      else typed0.repartition(shuffleKeys: _*)
    if (follow) typed.sortWithinPartitions(shuffleKeys: _*)
    else typed
  }

  /** One canonical scope key per (spec id, partition tuple): partition
    * identity across manifests of the same spec (sorted fields, nulls
    * marked). */
  private def scopeKey(specId: Long, tuple: Seq[(String, String)]): String =
    specId + "|" + tuple.map { case (k, v) =>
      k + "=" + (if (v == null) "\u0000" else v) }.mkString(",")

  /** Broadcasting one (path, sequence, scope) row per live data file is
    * the fast path for attaching the sequence gate to the scan; above
    * this many live files (a multi-GB broadcast at 10M files) the join
    * degrades to a plain shuffle join instead — the same two-tier
    * discipline as the DV mask reads. */
  private def broadcastFileMetaMax(spark: SparkSession): Long =
    scala.util.Try(spark.conf.get("graft.iceberg.broadcastFileMetaMax").toLong)
      .getOrElse(1000000L)

  /** Apply `st`'s equality deletes to `cur` (a live-file scan carrying
    * `__file`) under the spec's sequence rule — a delete applies only to
    * data files with a STRICTLY smaller data sequence number — and
    * partition scoping. Shaped for real CDC delete-file counts:
    *
    *  - ONE parallel footer pass resolves every delete file's key columns
    *    (by field id — delete files written before a rename keep the old
    *    name, the id binds them — by name only when id-less);
    *  - delete files group by (key ids, resolved column names) and each
    *    group reads in ONE `spark.read.parquet(paths*)` with an explicit
    *    target-typed schema (no N-leg unions, loud on an incompatible
    *    physical type — a silent cast-to-null would KEEP rows the delete
    *    intended to remove);
    *  - the data sequence number and scope ride the delete ROWS as data
    *    (a tiny per-file map joins on `_metadata.file_path`), so one
    *    anti-join per distinct key set applies every sequence and every
    *    partition at once;
    *  - the per-live-file (sequence, scope) attach broadcasts only below
    *    [[broadcastFileMetaMax]].
    *
    * Scope resolution per delete file (r13 verdict task 8):
    *  - unpartitioned delete spec → table-wide;
    *  - every scoped dimension's SOURCE column is part of the delete's
    *    equality key → the scope is IMPLIED by key equality (partition
    *    values are deterministic transforms of key columns, so a row
    *    matching the key necessarily lives in the delete's partition) —
    *    safe to apply table-wide; this covers the standard Flink upsert
    *    shape (table partitioned by a transform of the primary key,
    *    deletes scoped per partition);
    *  - otherwise the scope tuple only matches data files of the SAME
    *    spec: if any live file was written under a DIFFERENT spec id,
    *    tuples are not comparable across spec generations → REFUSE
    *    loudly. (Before r14 such a delete silently never matched — a
    *    silent-KEEP of rows the delete intended to remove.) */
  /** Attach each row's (data sequence number, partition-scope key) from a
    * per-file map joined on the reader path — only the SCANNED subset's
    * files, not the whole live set (an incremental sync's window must pay
    * O(window), not O(live files), in driver map-building and broadcast
    * bytes). Broadcast below [[broadcastFileMetaMax]], plain shuffle join
    * above (the DV two-tier discipline). */
  private def attachSeqScope(spark: SparkSession, root: Path,
      st: IcebergState, subset: Seq[(String, GenericRecord)],
      cur: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    import spark.implicits._
    val seqDf = subset.map { case (p, _) =>
      val (specId, tuple) = st.liveScope(p)
      (root.resolve(p).toString, st.liveSeq(p), scopeKey(specId, tuple))
    }.toDF("__sfile", "__seq", "__pscope")
    val seqSide =
      if (subset.size <= broadcastFileMetaMax(spark)) broadcast(seqDf)
      else seqDf
    cur.join(seqSide, cur("__file") === seqDf("__sfile")).drop("__sfile")
  }

  private def applyEqualityDeletes(spark: SparkSession, root: Path,
      st: IcebergState, cur0: org.apache.spark.sql.DataFrame,
      eqDeletes: Seq[EqDelete]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    import spark.implicits._
    var cur = cur0 // carries __seq and __pscope (attachSeqScope)
    resolveEqDeletes(st, eqDeletes).foreach { case (srcNames, keyFields, group) =>
      val paths = group.map(_.path).distinct.sorted
      // (sequence, scope) per delete FILE attach as DATA via a tiny map
      val metaDf = group.map { d =>
        (Paths.get(d.path).toString, d.seq, eqScopeOf(st, d).orNull) }
        .toDF("__dpath", "__dseq", "__dscope")
      // explicit target-typed read schema: by-name resolution of exactly
      // the resolved key columns (group membership guarantees presence),
      // loud on an unconvertible physical type
      val readSchema = StructType(srcNames.zip(keyFields).map {
        case (n, f) => StructField(n, f.dataType) })
      val delRaw = spark.read.schema(readSchema).parquet(paths: _*)
        .select(srcNames.zip(keyFields).map { case (n, f) =>
          col(s"`$n`").as(s"__eq_${f.name}") } :+
          graft.log.DvBitmap.stripPathCol(
            col("_metadata.file_path")).as("__dpath"): _*)
      val delDf = delRaw.join(broadcast(metaDf), "__dpath").drop("__dpath")
      val cond = keyFields.map(f =>
        cur(f.name) <=> delDf(s"__eq_${f.name}")).reduce(_ && _) &&
        cur("__seq") < delDf("__dseq") &&
        (delDf("__dscope").isNull || cur("__pscope") === delDf("__dscope"))
      cur = cur.join(delDf, cond, "left_anti")
    }
    cur
  }

  /** Scope resolution for one equality-delete file (r13 verdict task 8) —
    * see [[applyEqualityDeletes]]: None = applies table-wide (the
    * delete's spec is unpartitioned, or its every scoped dimension's
    * source column is part of the equality key so the scope is implied);
    * Some(key) = only data files sharing the partition, legal only while
    * every live file was written under the SAME spec (a cross-spec scoped
    * delete REFUSES — before r14 it silently never matched, a silent-KEEP
    * of rows the delete intended to remove). */
  private def eqScopeOf(st: IcebergState, d: EqDelete): Option[String] =
    if (st.specSize(d.specId) == 0) None
    else {
      val idToField: Map[Int, StructField] = st.schemaWithIds.fields
        .flatMap(f => ColumnIds.idOf(f).map(_.toInt -> f)).toMap
      val dims = st.specFields(d.specId).map(_.column)
      val keyCols = d.equalityIds.flatMap(i => idToField.get(i)).map(_.name)
      if (dims.forall(keyCols.contains)) None // implied by key equality
      else {
        val alien = st.live.collectFirst {
          case (p, _) if st.liveScope(p)._1 != d.specId => p }
        require(alien.isEmpty,
          s"equality-delete file ${d.path} is scoped to partition-spec " +
            s"${d.specId}, but live data file ${alien.getOrElse("")} was " +
            "written under a different spec — partition tuples are not " +
            "comparable across spec generations; import with the deletes " +
            "rewritten (or dropped into an unpartitioned spec) on the " +
            "Iceberg side")
        Some(scopeKey(d.specId, d.tuple))
      }
    }

  /** ONE parallel footer pass over `eqDeletes`, resolving each file's key
    * columns (by field id — delete files written before a rename keep the
    * old name, the id binds them — by name only when id-less) and grouping
    * by (key-id set, resolved column names) so each group can read in ONE
    * `spark.read.parquet(paths*)`. Deterministically ordered. */
  private[migrate] def resolveEqDeletes(st: IcebergState, eqDeletes: Seq[EqDelete])
      : Seq[(Seq[String], Seq[StructField], Seq[EqDelete])] = {
    if (eqDeletes.isEmpty) return Nil
    val idToField: Map[Int, StructField] = st.schemaWithIds.fields
      .flatMap(f => ColumnIds.idOf(f).map(_.toInt -> f)).toMap
    val delFooters = Stats.footerFieldIds(
      eqDeletes.map(d => Paths.get(d.path)).distinct)
    val resolved: Seq[(EqDelete, Seq[String], Seq[StructField])] =
      eqDeletes.map { d =>
        val footer = delFooters(Paths.get(d.path).toString)
        val byId = footer.collect { case (n, Some(i)) => i -> n }.toMap
        val ids = d.equalityIds.sorted
        val keyFields = ids.map(i => idToField.getOrElse(i,
          throw new IllegalArgumentException(
            s"equality delete references field id $i, which is not a " +
              "top-level schema column")))
        val srcNames = ids.zip(keyFields).map { case (i, f) =>
          byId.getOrElse(i, {
            require(footer.exists(_._1 == f.name),
              s"equality-delete file ${d.path} carries neither field " +
                s"id $i nor a column named '${f.name}'")
            f.name
          })
        }
        (d, srcNames, keyFields)
      }
    resolved.groupBy { case (d, srcNames, _) =>
      (d.equalityIds.sorted, srcNames) }.toSeq
      .sortBy { case ((ids, names), _) =>
        (ids.mkString(","), names.mkString(",")) }
      .map { case ((_, srcNames), group) =>
        (srcNames, group.head._3, group.map(_._1).sortBy(_.path))
      }
  }

  // ---------------------------------------------- followable rewrite state

  /** Lineage columns a followable rewrite adds to every row (shared with
    * the Delta rewrite — see [[Rewrite]]): the source data file
    * (root-relative) and the row's position in it — what [[syncRewrite]]
    * keys source-side removes and row-level deletes on. */
  val SrcFileCol: String = Rewrite.SrcFileCol
  val SrcPosCol: String = Rewrite.SrcPosCol

  /** Followable-rewrite destination properties. */
  val RewriteFollowKey = "graft.iceberg.rewriteFollow"
  val RewriteSourceKey = "graft.iceberg.rewriteSource"
  val RewriteSpecKey = "graft.iceberg.rewriteSpec"

  private val RwAppendAppId = Rewrite.AppendAppId
  private val RwRemoveAppId = Rewrite.RemoveAppId
  private val RwPosDelAppId = Rewrite.PosDelAppId
  private val RwEqDelAppId = Rewrite.EqDelAppId

  /** The canonical signature of a partition spec (field name, source
    * column, transform — order-sensitive): [[syncRewrite]] refuses when
    * the source's spec no longer matches the one the destination layout
    * was derived from. */
  private def specSignature(partFields: Seq[PartField]): String =
    partFields.map(pf => s"${pf.specName}:${pf.column}:${pf.transform}")
      .mkString(";")


  // ---- the live-set ledger: one JSON snapshot per consumed sequence ----

  private val LedgerDir = Rewrite.LedgerDir

  private case class Ledger(dataFiles: Seq[String],
      posDeleteFiles: Seq[String], eqDeleteFiles: Seq[String])

  /** Write the FULL current source state (live data files relative to the
    * source root; position/equality delete files canonical-absolute) as
    * `_graft_import/ledger-<lastSeq>-<metaVersion>.json` under the
    * destination. Name-keyed by the consumed ordering keys and derived
    * from one replayed snapshot, so a crash-replay rewrites identical
    * content — idempotent by construction. The next sync diffs against
    * the snapshot named by its CONSUMED keys to enumerate removed data
    * files and newly-arrived delete files in O(churn). */
  private def writeLedger(destRoot: Path, st: IcebergState): Unit = {
    val node = plain.createObjectNode()
    def arr(name: String, vs: Seq[String]): Unit = {
      val a = node.putArray(name)
      vs.sorted.foreach(a.add(_): Unit)
    }
    arr("dataFiles", st.live.map(_._1))
    arr("posDeleteFiles", st.deletePaths.map(Stats.stripScheme))
    arr("eqDeleteFiles", st.eqDeletes.map(_.path).distinct)
    store.writeAtomic(
      destRoot.resolve(LedgerDir).resolve(ledgerName(st.lastSeq, st.metaVersion)),
      plain.writeValueAsBytes(node), overwrite = true)
  }

  private def ledgerName(seq: Long, metaVersion: Long): String =
    s"ledger-$seq-$metaVersion.json"

  /** The ledger snapshot for the consumed sequence (any metadata version —
    * metadata-only advances reuse the sequence axis). */
  private def readLedger(destRoot: Path, seq: Long): Option[Ledger] = {
    val dir = destRoot.resolve(LedgerDir)
    val re = raw"ledger-(\d+)-(\d+)\.json".r
    val name = store.listFileNames(dir).collect {
      case n @ re(s, m) if s.toLong == seq => (m.toLong, n)
    }.sorted.lastOption.map(_._2)
    name.map { n =>
      val j = plain.readTree(new String(store.readBytes(dir.resolve(n)),
        StandardCharsets.UTF_8))
      def seqOf(field: String): Seq[String] = {
        val a = j.get(field)
        (0 until a.size()).map(a.get(_).asText())
      }
      Ledger(seqOf("dataFiles"), seqOf("posDeleteFiles"), seqOf("eqDeleteFiles"))
    }
  }

  /** Drop ledger snapshots STRICTLY OLDER than the previous consumed
    * sequence (the current and previous snapshots stay — the previous one
    * covers a sync that crashed between ledger write and commit).
    * Best-effort: a surviving stale file is dead weight, never wrong. */
  private def pruneLedgers(destRoot: Path, keepFrom: Long): Unit = {
    val dir = destRoot.resolve(LedgerDir)
    val re = raw"ledger-(\d+)-(\d+)\.json".r
    store.listFileNames(dir).foreach {
      case n @ re(s, _) if s.toLong < keepFrom =>
        scala.util.Try(store.delete(dir.resolve(n))): Unit
      case _ => ()
    }
  }

  // ------------------------------------------------------------ replay

  /** Replay `<root>`'s current Iceberg metadata into its live state.
    * Format versions 1 AND 2 replay: v1 predates sequence numbers, delete
    * manifests, and the `content` fields — absent fields default to their
    * spec-defined v1 readings (content 0, sequence 0) via Avro's
    * null-on-missing-field named access, and v1's legacy single `schema` /
    * `partition-spec` metadata keys resolve when the modern lists are
    * absent. A v1 table's sync ordering key is its metadata version
    * (monotonic per commit), since `last-sequence-number` does not exist
    * before v2. */
  private[migrate] def replay(root: Path): IcebergState = {
    val metaDir = root.resolve("metadata")
    val (metaVersion, meta) = resolveMetadata(metaDir)
    val formatVersion = num(meta.get("format-version"))
    require(formatVersion == 1 || formatVersion == 2,
      s"$root is an Iceberg format-version $formatVersion table — this " +
        "importer replays versions 1 and 2")

    // ---- schema (current-schema-id; v1 fallback: the legacy `schema`) ----
    val schemaNode = Option(meta.get("schemas")) match {
      case Some(schemas) =>
        val schemaId = num(meta.get("current-schema-id"))
        schemas.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
          .asScala.find(s => num(s.get("schema-id")) == schemaId)
          .getOrElse(throw new IllegalArgumentException(
            s"current-schema-id $schemaId not present in schemas"))
      case None => Option(meta.get("schema"))
        .map(_.asInstanceOf[java.util.Map[String, Object]])
        .getOrElse(throw new IllegalArgumentException(
          s"$root metadata carries neither `schemas` nor the v1 `schema`"))
    }
    val schemaWithIds = structOf(schemaNode, topLevelIds = true)

    // ---- partition specs (default for layout; ALL for delete scoping;
    // v1 fallback: the flat legacy partition-spec, implicitly id 0) ----
    val allSpecs: Map[Long, Seq[java.util.Map[String, Object]]] =
      Option(meta.get("partition-specs")) match {
        case Some(specs) =>
          specs.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
            .asScala.map(s => num(s.get("spec-id")) -> s.get("fields")
              .asInstanceOf[java.util.List[java.util.Map[String, Object]]]
              .asScala.toSeq).toMap
        case None => Map(0L -> Option(meta.get("partition-spec"))
          .map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
            .asScala.toSeq)
          .getOrElse(Nil))
      }
    val defaultSpecId =
      Option(meta.get("default-spec-id")).map(num).getOrElse(0L)
    val spec: Seq[java.util.Map[String, Object]] =
      allSpecs.getOrElse(defaultSpecId,
        throw new IllegalArgumentException(
          s"default-spec-id $defaultSpecId not present in partition-specs"))
    val idToName = schemaWithIds.fields.map(f =>
      ColumnIds.idOf(f).get -> f.name).toMap
    // the manifest partition record's Avro fields are named by the SPEC
    // field, which a foreign writer may name differently from the column
    def partFieldsOf(fields: Seq[java.util.Map[String, Object]]): Seq[PartField] =
      fields.map { f =>
        val column = idToName.getOrElse(num(f.get("source-id")),
          throw new IllegalArgumentException(
            s"partition source-id ${f.get("source-id")} is not a " +
              "top-level schema column"))
        PartField(f.get("name").toString, column, f.get("transform").toString)
      }
    val partFields: Seq[PartField] = partFieldsOf(spec)

    // ---- current snapshot -> manifests -> live files + deletes ----
    val currentSnap = Option(meta.get("current-snapshot-id"))
      .map(num).filter(_ != -1L)
    // fields a writer's avro schema does not carry read as their spec
    // defaults — exactly the v1/v2 evolution seam (`content`, sequence
    // numbers). GenericData.Record.get(name) THROWS on an unknown field,
    // so presence is checked against the record's own schema first.
    def getOpt(r: GenericRecord, field: String): Option[Object] =
      Option(r.getSchema.getField(field)).flatMap(f => Option(r.get(f.pos())))
    def intOr(r: GenericRecord, field: String, dflt: Int): Int =
      getOpt(r, field).map(_.asInstanceOf[Number].intValue()).getOrElse(dflt)
    def longOr(r: GenericRecord, field: String, dflt: Long): Long =
      getOpt(r, field).map(_.asInstanceOf[Number].longValue()).getOrElse(dflt)
    // the entry's partition tuple as written (its OWN avro record fields,
    // sorted by name; nulls kept) — the partition identity delete scoping
    // compares, independent of the default spec's field names
    def tupleOf(df: GenericRecord): Seq[(String, String)] = {
      val part = df.get("partition").asInstanceOf[GenericRecord]
      part.getSchema.getFields.asScala.map { fld =>
        fld.name() -> Option(part.get(fld.pos())).map(String.valueOf).orNull
      }.toSeq.sortBy(_._1)
    }
    val data = scala.collection.mutable.ListBuffer
      .empty[(GenericRecord, Long, Long, Seq[(String, String)])]
    val posDeletes = scala.collection.mutable.ListBuffer.empty[String]
    val eqDeletes = scala.collection.mutable.ListBuffer.empty[EqDelete]
    currentSnap.foreach { snapId =>
      val snap = meta.get("snapshots")
        .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
        .find(s => num(s.get("snapshot-id")) == snapId)
        .getOrElse(throw new IllegalArgumentException(
          s"current-snapshot-id $snapId not present in snapshots"))
      val manifests = avroRecords(
        Paths.get(Stats.stripScheme(snap.get("manifest-list").toString)))
      manifests.foreach { m =>
        val content = intOr(m, "content", 0)
        val manifestSeq = longOr(m, "sequence_number", 0L)
        val manifestSpecId = longOr(m, "partition_spec_id", 0L)
        avroRecords(Paths.get(
          Stats.stripScheme(m.get("manifest_path").toString))).foreach { e =>
          val status = e.get("status").asInstanceOf[Int]
          if (status != 2) { // 2 = DELETED
            val df = e.get("data_file").asInstanceOf[GenericRecord]
            val fileContent = intOr(df, "content", 0)
            // v2 sequence inheritance: an ADDED entry with a null sequence
            // inherits the manifest's; EXISTING entries carry it explicitly
            // (v1 predates sequences entirely -> 0)
            val seq = getOpt(e, "sequence_number")
              .map(_.asInstanceOf[Number].longValue())
              .getOrElse(if (status == 1) manifestSeq else 0L)
            (content, fileContent) match {
              case (0, 0) => data += ((df, seq, manifestSpecId, tupleOf(df)))
              case (1, 1) => posDeletes += df.get("file_path").toString
              case (1, 2) =>
                val ids = getOpt(df, "equality_ids")
                  .map(_.asInstanceOf[java.util.List[_]].asScala
                    .map(_.asInstanceOf[Number].intValue()).toSeq)
                  .getOrElse(Nil)
                require(ids.nonEmpty,
                  s"equality-delete file ${df.get("file_path")} carries no " +
                    "equality_ids — malformed")
                eqDeletes += EqDelete(
                  Stats.stripScheme(df.get("file_path").toString), seq, ids,
                  manifestSpecId, tupleOf(df))
              case other => throw new IllegalArgumentException(
                s"manifest/file content mismatch $other in " +
                  s"${m.get("manifest_path")}")
            }
          }
        }
      }
    }

    // ---- paths relativize against the root (refuse external) ----
    def relativize(p: String): String = {
      val abs = Paths.get(Stats.stripScheme(p)).toAbsolutePath.normalize
      require(abs.startsWith(root),
        s"Iceberg data file $p does not live under the table root $root " +
          "— cannot import in place")
      root.relativize(abs).toString
    }
    val live: Seq[(String, GenericRecord)] = data.toList.map {
      case (df, _, _, _) =>
        val fmt = df.get("file_format").toString
        require(fmt.equalsIgnoreCase("parquet"),
          s"data file format '$fmt' is not parquet — cannot import")
        relativize(df.get("file_path").toString) -> df
    }
    val liveSeq: Map[String, Long] = live.map(_._1)
      .zip(data.toList.map(_._2)).toMap
    val liveScope: Map[String, (Long, Seq[(String, String)])] = live.map(_._1)
      .zip(data.toList.map(d => (d._3, d._4))).toMap
    require(live.map(_._1).distinct.size == live.size,
      s"duplicate live data-file paths in $root's manifests — malformed")
    IcebergState(metaVersion, meta,
      Option(meta.get("last-sequence-number")).map(num)
        .getOrElse(if (formatVersion == 1) metaVersion else 0L),
      formatVersion, schemaWithIds, partFields, live, liveSeq, liveScope,
      allSpecs.view.mapValues(partFieldsOf).toMap,
      posDeletes.toList, eqDeletes.toList)
  }

  /** One live entry -> graft AddFile: manifest count cross-checked against
    * the footer, footer-exact stats, identity partition tuple decoded by
    * the SPEC field name into graft's string encoding. */
  private def toAddFile(st: IcebergState, root: Path, p: String,
      df: GenericRecord,
      footer: (Long, Map[String, ColStats], Seq[(String, Option[Int])]),
      now: Long, tags: Map[String, String] = Map.empty): AddFile = {
    val (footerCount, colStats, _) = footer
    val manifestCount = df.get("record_count").asInstanceOf[Long]
    require(manifestCount == footerCount,
      s"manifest says $manifestCount records for $p, the footer says " +
        s"$footerCount — refusing inconsistent metadata")
    val pv: Map[String, String] =
      if (st.pcols.isEmpty) Map.empty
      else {
        val part = df.get("partition").asInstanceOf[GenericRecord]
        st.partFields.map { pf =>
          val v = part.get(pf.specName) // keyed by the SPEC field name
          val dt = st.schemaWithIds.fields.find(_.name == pf.column).get.dataType
          pf.column -> (if (v == null) null else dt match {
            case DateType => java.time.LocalDate
              .ofEpochDay(v.asInstanceOf[java.lang.Number].longValue()).toString
            case _ => v.toString
          })
        }.toMap
      }
    AddFile(path = p, partitionValues = pv,
      size = df.get("file_size_in_bytes").asInstanceOf[Long],
      numRecords = manifestCount, stats = colStats,
      modificationTime = now,
      tags = if (tags.isEmpty) null else tags)
  }

  /** Decode the current position deletes into ONE graft dv parquet under
    * `root`; returns (relative dv path, per-ABS-path mask counts), or None
    * when there are no delete files. file_path values canonicalize like
    * data paths (scheme-ful URIs); DANGLING rows drop via a broadcast
    * semi-join against the live set — never phantom vectors, never fatal. */
  private def buildMasks(spark: SparkSession, root: Path,
      deletePaths: Seq[String],
      liveAbs: Set[String]): Option[(String, Map[String, Long])] = {
    if (deletePaths.isEmpty) return None
    val rel = s"dv/import-${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
    import org.apache.spark.sql.functions.col
    val liveDf = {
      import spark.implicits._
      liveAbs.toSeq.toDF("__path")
    }
    val masks = spark.read
      .parquet(deletePaths.map(p => Stats.stripScheme(p)): _*)
      .select(graft.log.DvBitmap.stripPathCol(
        col("file_path").cast(StringType)).as("__path"), col("pos"))
      .join(org.apache.spark.sql.functions.broadcast(liveDf),
        Seq("__path"), "left_semi")
      .groupBy("__path")
      .agg(graft.log.DvBitmap.aggPositions(col("pos")).as("__bitmap"))
    masks.withColumn("__n", graft.log.DvBitmap.cardinality(col("__bitmap")))
      .write.mode("errorifexists").parquet(root.resolve(rel).toString)
    val counts = spark.read.parquet(root.resolve(rel).toString)
      .select("__path", "__n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Some((rel, counts))
  }

  // ------------------------------------------------------------ helpers

  /** One footer's (count, name-keyed stats, (name, id) pairs) with the
    * stats entries whose footer NAME collides with a different-id schema
    * column removed — by-id reads return a different column's bytes for
    * that name, so name-attributed stats for it are poison, not data. */
  private def dropMisattributedStats(
      footer: (Long, Map[String, ColStats], Seq[(String, Option[Int])]),
      idOfName: Map[String, Long])
      : (Long, Map[String, ColStats], Seq[(String, Option[Int])]) = {
    val (count, stats, ids) = footer
    val poisoned = ids.collect { case (name, Some(id))
      if idOfName.get(name).exists(_ != id.toLong) => name }.toSet
    if (poisoned.isEmpty) footer else (count, stats -- poisoned, ids)
  }

  private def num(o: Object): Long = o.asInstanceOf[java.lang.Number].longValue()

  /** Sort-order + Puffin-statistics translation for the zero-copy import
    * (r14): the source's DEFAULT sort order — when every field is an
    * identity transform over a top-level column — becomes graft's declared
    * clustering (`graft.clusterBy`: the same "how writers should order
    * data" intent, so future graft ingest clusters by it); any other
    * shape, and the unknown-transform future, DROPS (sort orders are
    * advisory). The CURRENT snapshot's Puffin statistics decode into
    * `stats.<col>.distinctCount` properties (theta blobs only; unknown
    * blob types, compressed payloads, and unreadable files drop — a
    * MISSING statistic is always safe, a mis-decoded one is not). The
    * sketch BYTES carry too, re-written as graft's own `_stats` sidecar,
    * so a UniForm RE-export of the mirror publishes the statistics
    * onward without a fresh [[graft.table.LakeTable.analyzeSketches]]
    * pass — full import → mirror → export symmetry. */
  private def sortAndStatsProps(st: IcebergState, root: Path): Map[String, String] = {
    val idToName: Map[Int, String] = st.schemaWithIds.fields
      .flatMap(f => ColumnIds.idOf(f).map(_.toInt -> f.name)).toMap
    def maps(o: Object): Seq[java.util.Map[String, Object]] =
      Option(o).map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
        .asScala.toSeq).getOrElse(Nil)
    val cluster: Map[String, String] = scala.util.Try {
      val defId = Option(st.meta.get("default-sort-order-id"))
        .map(num).getOrElse(0L)
      val fields = maps(st.meta.get("sort-orders"))
        .find(o => num(o.get("order-id")) == defId)
        .map(o => maps(o.get("fields"))).getOrElse(Nil)
      val cols = fields.map(f =>
        if (String.valueOf(f.get("transform")) == "identity")
          idToName.get(num(f.get("source-id")).toInt)
        else None)
      if (cols.nonEmpty && cols.forall(_.isDefined))
        Map("graft.clusterBy" -> cols.map(_.get).mkString(","))
      else Map.empty[String, String]
    }.getOrElse(Map.empty)
    val ndv: Map[String, String] = scala.util.Try {
      val current = Option(st.meta.get("current-snapshot-id"))
        .map(num).getOrElse(-1L)
      val sketches: Seq[(String, Array[Byte], Long)] =
        maps(st.meta.get("statistics"))
          .filter(e => num(e.get("snapshot-id")) == current)
          .flatMap { e =>
            val p = Paths.get(
              Stats.stripScheme(String.valueOf(e.get("statistics-path"))))
            scala.util.Try(graft.table.Puffin.read(store, p)).getOrElse(Nil)
              .flatMap { b =>
                if (b.blobType != graft.table.Puffin.ThetaBlobType ||
                  b.fields.size != 1) Nil
                else for {
                  name <- idToName.get(b.fields.head).toSeq
                  est <- graft.table.Puffin.thetaEstimate(b.bytes).toSeq
                } yield (name, b.bytes, est)
              }
          }
      if (sketches.isEmpty) Map.empty[String, String]
      else {
        // carry the SKETCHES, not just their estimates: re-writing them
        // as graft's own sidecar lets a UniForm RE-export of this mirror
        // publish the statistics onward without a fresh analyzeSketches
        // pass (full import -> mirror -> export symmetry)
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = mapper.createObjectNode()
        node.put("analyzedAtVersion", -1L)
        val colsNode = node.putObject("columns")
        val b64 = java.util.Base64.getEncoder
        sketches.foreach { case (n, bytes, _) =>
          colsNode.put(n, b64.encodeToString(bytes)): Unit }
        val rel = s"_stats/theta-imported-$current.json"
        store.writeAtomic(root.resolve(rel),
          mapper.writeValueAsBytes(node), overwrite = true)
        sketches.map { case (n, _, est) =>
          s"stats.$n.distinctCount" -> est.toString }.toMap +
          ("graft.stats.thetaSidecar" -> rel)
      }
    }.getOrElse(Map.empty)
    cluster ++ ndv
  }

  private def avroRecords(p: Path): Seq[GenericRecord] =
    graft.table.Uniform.avroRecords(p, store)

  /** Current metadata: `version-hint.text` names it; else the highest
    * `v<N>.metadata.json` present. */
  private def resolveMetadata(metaDir: Path): (Long, java.util.Map[String, Object]) = {
    val names = store.listFileNames(metaDir)
    require(names.nonEmpty, s"no metadata/ under ${metaDir.getParent}")
    val hinted = scala.util.Try(new String(store.readBytes(
      metaDir.resolve("version-hint.text")), StandardCharsets.UTF_8).trim.toLong)
      .toOption
    val re = raw"v(\d+)\.metadata\.json".r
    val v = hinted.orElse {
      names.flatMap {
        case re(n) => Some(n.toLong); case _ => None
      }.maxOption
    }.getOrElse(throw new IllegalArgumentException(
      s"no v<N>.metadata.json under $metaDir"))
    (v, plain.readValue(
      new String(store.readBytes(metaDir.resolve(s"v$v.metadata.json")),
        StandardCharsets.UTF_8),
      classOf[java.util.Map[String, Object]]))
  }

  /** Spark type for an Iceberg type node (primitive string or nested
    * object) — the inverse of [[graft.table.Uniform.icebergType]]. */
  private[migrate] def sparkType(t: Object): DataType = t match {
    case s: String => s match {
      case "long" => LongType
      case "int" => IntegerType
      case "string" => StringType
      case "double" => DoubleType
      case "float" => FloatType
      case "boolean" => BooleanType
      case "date" => DateType
      case "timestamptz" => TimestampType
      case "timestamp" => TimestampNTZType
      case "binary" => BinaryType
      case dec if dec.startsWith("decimal(") =>
        val m = raw"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)".r
          .findFirstMatchIn(dec).getOrElse(
            throw new IllegalArgumentException(s"bad decimal type '$dec'"))
        DecimalType(m.group(1).toInt, m.group(2).toInt)
      case other => throw new IllegalArgumentException(
        s"Iceberg type '$other' has no Spark mapping in this importer")
    }
    case m: java.util.Map[_, _] =>
      val tm = m.asInstanceOf[java.util.Map[String, Object]]
      tm.get("type").toString match {
        case "struct" => structOf(tm, topLevelIds = false)
        case "list" => ArrayType(sparkType(tm.get("element")),
          containsNull = !tm.get("element-required").asInstanceOf[Boolean])
        case "map" => MapType(sparkType(tm.get("key")),
          sparkType(tm.get("value")),
          valueContainsNull = !tm.get("value-required").asInstanceOf[Boolean])
        case other => throw new IllegalArgumentException(
          s"Iceberg nested type '$other' has no Spark mapping")
      }
    case other => throw new IllegalArgumentException(
      s"unparseable Iceberg type node: $other")
  }

  /** StructType for an Iceberg struct node. Top-level fields carry their
    * Iceberg ids as parquet field ids (the binding decision strips them
    * later if the files cannot support by-id reads). */
  private def structOf(node: java.util.Map[String, Object],
      topLevelIds: Boolean): StructType =
    StructType(node.get("fields")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
      .map { f =>
        val base = StructField(f.get("name").toString,
          sparkType(f.get("type")),
          nullable = !f.get("required").asInstanceOf[Boolean])
        if (topLevelIds) ColumnIds.withId(base, num(f.get("id"))) else base
      }.toSeq)
}
