package graft.migrate

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.log.{AddFile, ColStats, CommitInfo, Stats, TxLog}
import graft.table.LakeTable

/** Zero-copy import of a Delta Lake table (the inverse of the reference's
  * migration direction — `CONVERT` pointed at a directory with a
  * `_delta_log` replays the DELTA log instead of listing parquet files).
  *
  * The public Delta protocol spec defines the log as newline-delimited JSON
  * actions under `_delta_log/<20-digit-version>.json` plus parquet
  * checkpoints (`<v>.checkpoint.parquet`, classic single or multi-part)
  * named by `_last_checkpoint`. This importer reconstructs the LIVE
  * snapshot — latest metaData/protocol, the add set minus removes — and
  * materializes it as graft's own initial commit in `_txlog/`, sharing
  * every data file in place. A 100 TB Delta table imports in
  * driver-metadata time: one checkpoint read (a Spark job over metadata
  * parquet) plus the JSON tail.
  *
  * Honest scope — refuse rather than silently mis-read:
  *  - PARTITIONED tables: Delta stores partition values only in the log
  *    and directory names, never in the data files; graft's read model
  *    keeps partition columns as real data columns. The zero-copy import
  *    would produce rows with missing columns → refuse, pointing at
  *    [[convertRewrite]] (one scan + broadcast tuple join, O(data) once).
  *  - LIVE deletion vectors IMPORT: descriptors parse per the public spec
  *    ([[DeltaDv]] — z85 packing, CRC-checked `.bin` ranged reads, the
  *    portable RoaringBitmapArray container) and transcode bitmap-to-bitmap
  *    into the engine's own masks, decoded DISTRIBUTED on executors.
  *    Absolute-path (`p`) vectors refuse like absolute add paths.
  *  - Column mapping `id`/`name` modes IMPORT: `delta.columnMapping.id`
  *    translates to the `parquet.field.id` resolution graft's own mapped
  *    tables use ([[graft.log.ColumnIds]]), after a footer gate proves
  *    every live file actually carries agreeing ids (an id-less file —
  *    possible in upgraded `name`-mode tables — refuses toward
  *    [[convertRewrite]], which resolves by physical NAME instead).
  *    Stats and partition values translate from their physical-name keys.
  *  - Reader features beyond what this engine honors (unknown future
  *    features) → refuse loudly, exactly like the engine's own
  *    forward-compat gate. `v2Checkpoint` IS honored: UUID-named json or
  *    parquet manifests, classic-named v2 manifests, and
  *    `_delta_log/_sidecars/` action files all replay.
  *
  * Stats carry over only where Delta's JSON encoding is EXACT:
  * integer/long/float/double/decimal/boolean/date bounds convert to the
  * canonical encodings (numbers parse as BigDecimal so decimals never
  * round through a double); string and timestamp bounds are DROPPED —
  * Delta truncates long strings and rounds timestamp maxima up to the
  * millisecond, both directions safe for skipping but wrong for graft's
  * metadata-only EXACT min/max answers, and a bound that cannot be
  * trusted exactly is a bound this engine must not import. Null counts
  * always carry over; files with no stats at all fall back to one
  * driver-side footer read (the CONVERT path's machinery). Pruning on
  * the dropped columns heals as files rewrite under graft.
  */
object DeltaImport {

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS, true)

  /** Reader features this engine can honor on import (the live-DV and
    * column-mapping-mode gates below are the real guards; the feature
    * names alone do not make a table unreadable). */
  private val SupportedReaderFeatures =
    Set("timestampNtz", "columnMapping", "deletionVectors", "v2Checkpoint",
      // honored since r13: the per-field delta.typeChanges record
      // translates onto graft.typeChanges (translateTypeChanges), so the
      // engine upcasts old files and keeps stat/bloom honesty
      "typeWidening")

  /** Table property recording the highest Delta version the import/sync
    * has consumed. */
  val SourceVersionKey = "graft.delta.sourceVersion"

  /** Followable-rewrite destination properties ([[convertRewrite]] with
    * `follow = true`; see [[Rewrite]]). */
  val RewriteFollowKey = "graft.delta.rewriteFollow"
  val RewriteSourceKey = "graft.delta.rewriteSource"

  /** The Delta log reads ride the engine's [[graft.log.LogStore]] seam
    * (swap [[graft.log.LogStore.default]] to route ALL import IO through
    * an object store); data parquet, checkpoint parquet, and DV sidecars
    * are data-plane reads through Spark/Hadoop FS, object-store capable
    * by construction. */
  private def store: graft.log.LogStore = graft.log.LogStore.default

  def isDeltaTable(dir: String): Boolean =
    store.listFileNames(Paths.get(dir, "_delta_log")).nonEmpty

  /** Incremental catch-up after [[convert]]: apply the Delta commits that
    * landed in `_delta_log` SINCE the last consumed version as ONE graft
    * commit (net adds/removes across the range — a file added and removed
    * within it never materializes), advancing [[SourceVersionKey]] in the
    * same commit so the operation is atomic and a re-run is a no-op. The
    * continuous-migration shape: convert once, sync on a cadence, cut over
    * when ready. Per-commit cost is O(new JSON lines) driver work.
    *
    * Same honesty gates as the import, plus: a mid-stream `metaData`
    * whose schema differs from the table's FOLLOWS when [[Evolution]]
    * allows it (mapped: renames + added nullable columns by field id;
    * name-bound: added nullable columns only) and refuses everything else
    * as the cut-over moment. A gap in the JSON
    * chain (the Delta side checkpointed and CLEANED past us) falls back to
    * [[snapshotDiffSync]] when a checkpoint covers it — O(checkpoint rows)
    * for that one sync instead of a re-import — and refuses only when the
    * intervening state is genuinely unreconstructable. Returns the new
    * graft version (the current one when there was nothing to sync). */
  def sync(spark: SparkSession, dir: String): Long = {
    val t = LakeTable.forPath(spark, dir)
    val root = Paths.get(dir)
    val logDir = root.resolve("_delta_log")
    // a rewrite destination also carries the consumed-version key but is
    // NOT an in-place mirror (its source lives elsewhere) — without this
    // gate the failure would be a confusing missing-_delta_log error
    require(!t.properties.get(RewriteFollowKey).contains("true"),
      s"$dir is a followable REWRITE destination — sync it with " +
        "DeltaImport.syncRewrite(spark, sourceDir, destDir)")
    val from = t.properties.get(SourceVersionKey).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"$dir was not imported from Delta (no $SourceVersionKey property)"))
    // divergence guard ([[SyncGuard]]): checked at entry for a fast loud
    // failure AND re-checked inside the commit closure (TOCTOU)
    val syncOps = Set("CONVERT", "DELTA SYNC")
    SyncGuard.requireNotDiverged(t.snapshot().commits, syncOps, "Delta")
    val entries = store.listFileNames(logDir)
    val jsonRe = raw"(\d{20})\.json".r
    val newer = entries.collect { case jsonRe(v) => v.toLong }
      .filter(_ > from).sorted
    // "nothing newer" is only "up to date" when the CHECKPOINT agrees: a
    // source that checkpointed past `from` and cleaned the JSON tail has
    // advanced invisibly, and reporting freshness would be silently stale
    val checkpointVersion: Option[Long] = scala.util.Try {
      mapper.readTree(new String(store.readBytes(
        logDir.resolve("_last_checkpoint")), StandardCharsets.UTF_8))
        .get("version").asLong()
    }.toOption
    val chainIntact = newer.nonEmpty && newer.head == from + 1 &&
      newer.zip(newer.tail).forall { case (a, b) => b == a + 1 }
    if (!chainIntact) {
      // the source checkpointed and cleaned the JSON tail past us. With a
      // checkpoint AHEAD of the consumed version the state is still fully
      // reconstructable — fall back to a SNAPSHOT DIFF (the Iceberg sync's
      // shape): replay the full current state and apply the net difference.
      // Cost degrades from O(new JSON lines) to O(checkpoint rows) for
      // this one sync — still zero data IO.
      // (a checkpoint at or below `from` cannot cover the missing
      // commits, so cv > from is exactly the reconstructable case)
      if (checkpointVersion.exists(_ > from))
        return snapshotDiffSync(spark, t, root, from, syncOps)
      if (newer.isEmpty) return t.version // genuinely up to date
      throw new IllegalArgumentException(
        s"Delta log advanced past the retained JSON tail (have $newer " +
          s"after consumed $from) and no checkpoint covers the gap — " +
          "the intervening state is unreconstructable; re-import")
    }

    val schema = t.snapshot().schema
    // a column-mapped import keeps resolving by field id; the physical
    // names (kept in the schema metadata by translateMapping) key the
    // incoming commits' stats
    val mapped = graft.log.ColumnIds.mapped(schema)
    val physicalOf: Map[String, String] =
      if (!mapped) Map.empty else physicalNamesOf(schema)
    // FINAL disposition per path — last action wins, exactly like the log
    // replay itself. (Pairwise netting is wrong: remove -> add -> remove of
    // one path must still REMOVE the pre-existing live file, but netting
    // the second remove against the in-range add silently dropped it —
    // caught by DeltaImportFuzzSpec.)
    val state = mutable.LinkedHashMap.empty[String, Option[AddInfo]]
    // Delta-side configuration changes propagate: the LAST in-range
    // metaData's configuration merges into the sync commit's properties
    // (adds and updates; a Delta-side UNSET does not remove the graft key —
    // provenance of non-delta-prefixed keys is unknowable, so removals are
    // a manual unsetProperties after cut-over)
    var syncedConf: Option[Map[String, String]] = None
    // r13: SOURCE-side schema evolution follows when [[Evolution]] allows
    // it (mapped: renames + added nullable columns; name-bound: adds
    // only). Each in-range metaData must be followable from the PREVIOUS
    // effective schema; the LAST one becomes the sync commit's schema.
    var effSchema: StructType = schema
    // stat ERA per add (r13 verdict task 4): `era` bumps on every REAL
    // in-range schema change, and each add records the era it was written
    // under, so a range that carries a widening no longer skips heal tags
    // on ALL its files — files written AFTER the change (the common
    // cadence shape: widen at v, keep writing v+1..v+k) tag on arrival
    // and answer exact bounds immediately. metaData is applied FIRST
    // within each version regardless of line order: a commit's adds
    // conform to its own metaData (the transaction that changed the
    // schema wrote them), so their era is the post-change schema even if
    // the writer serialized the add lines first.
    var era = 0
    newer.foreach { v =>
      val lines = new String(store.readBytes(
        logDir.resolve(f"$v%020d.json")), StandardCharsets.UTF_8)
        .split("\n").filter(_.trim.nonEmpty)
      val nodes = lines.map(mapper.readTree)
      nodes.filter(_.has("metaData")).foreach { n =>
          val m = n.get("metaData")
          val incoming0 = DataType.fromJson(
            m.get("schemaString").asText()).asInstanceOf[StructType]
          // a mapped source's metaData carries the Delta-form schema:
          // translate before comparing
          val sourceMapped = incoming0.fields.nonEmpty &&
            incoming0.fields.forall(_.metadata.contains(MappingIdKey))
          val incoming = translateTypeChanges(
            if (mapped && sourceMapped) translateMapping(incoming0)._1
            else incoming0)
          // compare MODULO typeChanges versions: a followed widening
          // records graft's commit version on the mirror while the
          // source's delta.typeChanges carries the Delta version, so an
          // UNCHANGED schema in a later metaData line (even a pure
          // property change) must not classify as an evolution — that
          // misclassification skipped the heal tags on every range with
          // any metaData, and stat/bloom trust healed slower than
          // documented whenever the source emitted periodic metaData
          if (graft.log.TypeWidening.ignoringChangeVersions(incoming) !=
              graft.log.TypeWidening.ignoringChangeVersions(effSchema)) {
            // a binding-mode flip is never followable: a name-bound mirror
            // cannot see a mapped source's renames (new files' PHYSICAL
            // columns would silently read null), and a mapped mirror
            // cannot follow a source that dropped its ids
            require(mapped == sourceMapped,
              s"Delta commit $v changes the schema AND the column-mapping " +
                "mode differs between source and mirror — re-import")
            Evolution.requireFollowable(effSchema, incoming, mapped, "Delta")
            effSchema = incoming
            era += 1
          }
          // a same-schema REPLACE that introduces partitioning would make
          // the new adds' values live only in the log — the import-time
          // refusal, re-checked mid-stream
          val pcols = Option(m.get("partitionColumns"))
            .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
          require(pcols.isEmpty,
            s"Delta commit $v repartitions the table " +
              s"(${pcols.mkString(", ")}) — not syncable in place; " +
              "re-import with convertRewrite")
          syncedConf = Some(Option(m.get("configuration"))
            .map(c => c.properties().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap)
            .getOrElse(Map.empty))
      }
      nodes.foreach { n =>
        if (n.has("protocol")) {
          val p = n.get("protocol")
          val feats = Option(p.get("readerFeatures"))
            .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty)
          val unknown = feats -- SupportedReaderFeatures
          require(unknown.isEmpty, s"Delta commit $v enables reader " +
            s"feature(s) ${unknown.toSeq.sorted.mkString(", ")} this " +
            "importer does not honor")
        }
        if (n.has("add")) {
          val a = n.get("add")
          // DV descriptors net like everything else: a mask written at v
          // and purged at v+k inside the range never decodes — only the
          // FINAL disposition's masks materialize as graft vectors
          state.update(decodePath(a.get("path").asText()),
            Some(AddInfo(a.get("size").asLong(),
              a.get("modificationTime").asLong(),
              Option(a.get("stats")).filterNot(_.isNull).map(_.asText()),
              dvOf(a), Map.empty, era))): Unit
        }
        if (n.has("remove"))
          state.update(decodePath(n.get("remove").get("path").asText()), None): Unit
      }
    }
    val adds = state.toSeq.collect { case (p, Some(info)) => p -> info }
    val removes = state.collect { case (p, None) => p }.toSeq
    // footer gate + stats bind against the EFFECTIVE (possibly evolved)
    // schema — new files written after an in-range ADD COLUMN carry it
    val evolvedSync = effSchema != schema
    val effPhys: Map[String, String] =
      if (!mapped) Map.empty
      else if (!evolvedSync) physicalOf
      else physicalNamesOf(effSchema)
    // the same footer honesty gate convert and snapshotDiffSync apply: a
    // synced commit adding an id-less file (the upgraded name-mode hazard)
    // must refuse HERE, not mis-read silently at query time (ADVICE r12)
    if (mapped && adds.nonEmpty)
      verifyFooterIds(root, adds.map(_._1), effSchema, effPhys)
    val now = System.currentTimeMillis()
    // stat-era heal tags (r13 verdict task 4 — replacing the conservative
    // whole-range skip): each add resolved its ERA against the in-range
    // schema changes, so files written AT OR AFTER the range's LAST change
    // were written by the source under the FINAL types — they tag and
    // answer exact bounds on arrival, even in a range that carries the
    // widening itself. Pre-change adds stay untagged (conservative: their
    // stats were collected under the old types). The tag schema is the
    // MERGED mirror schema (it carries the name-reuse markers and graft's
    // change history); SyncGuard refuses any concurrent local commit, so
    // the entry-time merge matches the closure's.
    val finalEra = era
    val tagSchema: StructType =
      if (!evolvedSync) effSchema
      else Evolution.mergedSchema(schema, effSchema, mapped,
        t.snapshot().metadata.properties, t.version + 1)._1
    val syncTags: Map[String, String] = tagSchema.fields
      .filter(f => graft.log.TypeWidening.hasChanges(f) ||
        graft.log.TypeWidening.nameReused(f))
      .map(f => graft.log.TypeWidening.tagKey(f) ->
        graft.log.TypeWidening.changeCount(f).toString).toMap
    val (lastEraAdds, priorEraAdds) = adds.partition(_._2.era == finalEra)
    val graftAdds: Seq[graft.log.Action] =
      toAddFiles(spark, root, lastEraAdds, effSchema, effPhys, syncTags) ++
        toAddFiles(spark, root, priorEraAdds, effSchema, effPhys)
    // the FINAL disposition's live masks transcode into graft vectors
    // (written before the commit loop, like every dv parquet); a final
    // re-add WITHOUT a descriptor is a Delta-side purge — it must CLEAR
    // any graft vector the path carried (computed in the closure, where
    // the current dv state is known)
    val dvActions = importDvActions(spark, root,
      adds.collect { case (p, i) if i.dv.isDefined => p -> i.dv.get })
    try {
      t.commitWithRetry("DELTA SYNC",
        Map("fromVersion" -> from.toString, "toVersion" -> newer.max.toString),
        t.snapshot(),
        Map("numAddedFiles" -> graftAdds.size.toLong,
          "numRemovedFiles" -> removes.size.toLong)) { s =>
        // a racing sync already consumed past `from`: stand down, no-op
        if (s.metadata.properties.get(SourceVersionKey).exists(_.toLong > from))
          throw new LakeTable.EpochAlreadyCommitted
        // TOCTOU closure re-check: a local write that landed after the
        // entry guard makes this retry refuse instead of duplicating rows
        SyncGuard.requireNotDiverged(s.commits, syncOps, "Delta")
        SyncGuard.requireNoConstraintsForAdds(s.metadata.properties,
          graftAdds.size.toLong, "Delta")
        val live = s.files.map(_.path).toSet
        // a followable evolution applies onto the CURRENT schema (by id
        // when mapped) so local field metadata survives; the id high-water
        // mark rises with added columns (never reuse a source id)
        val (mergedJson, retireProp) =
          if (!evolvedSync) (s.metadata.schemaJson, Map.empty[String, String])
          else {
            val (m, rp) = Evolution.mergedSchema(s.schema, effSchema, mapped,
              s.metadata.properties, s.version + 1)
            (m.json, rp)
          }
        val maxIdProp: Map[String, String] =
          if (!mapped || !evolvedSync) Map.empty
          else Map(graft.log.ColumnIds.MaxIdKey -> math.max(
            s.metadata.properties.get(graft.log.ColumnIds.MaxIdKey)
              .map(_.toLong).getOrElse(0L),
            math.max(
              syncedConf.flatMap(_.get("delta.columnMapping.maxColumnId"))
                .map(_.toLong).getOrElse(0L),
              graft.log.ColumnIds.maxId(Map.empty, effSchema))).toString)
        val meta = s.metadata.copy(schemaJson = mergedJson, properties =
          s.metadata.properties ++
            LakeTable.normalizeProps(syncedConf.getOrElse(Map.empty)) ++
            maxIdProp ++ retireProp +
            (SourceVersionKey -> newer.max.toString))
        // property-implies-feature, exactly as setProperties stamps it: a
        // synced delta.enableChangeDataFeed / enableDeletionVectors / …
        // lands with its table feature in the same commit — and imported
        // masks stamp deletionVectors even without the property (a Delta
        // table can carry vectors after the property was unset)
        val proto = graft.log.Protocol.merge(
          graft.log.Protocol.merge(s.protocol,
            LakeTable.impliedFeatures(meta.properties)),
          if (dvActions.isEmpty) s.protocol
          else graft.log.Protocol(1, 1, null, Seq("deletionVectors")))
        val clears = adds.collect {
          case (p, i) if i.dv.isEmpty && s.dvs.contains(p) =>
            graft.log.DeletionVector(p, "", 0L)
        }
        (if (proto == s.protocol) Seq(meta) else Seq(proto, meta)) ++
          graftAdds ++ dvActions ++ clears ++
          removes.toSeq.filter(live.contains)
            .map(p => graft.log.RemoveFile(p, now))
      }
    } catch { case _: LakeTable.EpochAlreadyCommitted => () }
    t.version
  }

  /** Snapshot-diff fallback for [[sync]] when the source checkpointed and
    * CLEANED the JSON tail past the consumed version: the incremental
    * replay is impossible, but the checkpoint still reconstructs the full
    * current state — so apply the NET difference against the graft live
    * set as one commit (new files add zero-copy, vanished files remove,
    * the DV state rebuilds with vanished masks cleared), exactly the
    * [[IcebergImport.sync]] shape. Honesty gates match the import's; a
    * schema or partitioning change still refuses as the cut-over moment. */
  private[migrate] def snapshotDiffSync(spark: SparkSession, t: LakeTable, root: Path,
      from: Long, syncOps: Set[String]): Long = {
    val st = replay(spark, root)
    // _last_checkpoint and the replayed listing can race (the fallback was
    // entered off the pointer alone): a state resolving at-or-behind the
    // consumed version means there is nothing to sync YET — a no-op for
    // the caller's cadence, not an error (ADVICE r12)
    if (st.sourceVersion <= from) return t.version
    gate(root.toString, st)
    require(st.partitionColumns.isEmpty,
      s"the Delta source became PARTITIONED — not syncable in place; " +
        "re-import with convertRewrite")
    val snap0 = t.snapshot()
    val schema = snap0.schema
    val mapped = graft.log.ColumnIds.mapped(schema)
    val deltaSchema = DataType.fromJson(st.schemaString).asInstanceOf[StructType]
    val sourceMapped = deltaSchema.fields.nonEmpty &&
      deltaSchema.fields.forall(_.metadata.contains(MappingIdKey))
    val (incoming, physicalOf) = {
      val (s0, phys) =
        if (mapped && sourceMapped) translateMapping(deltaSchema)
        else (deltaSchema, Map.empty[String, String])
      (translateTypeChanges(s0), phys)
    }
    // r13: schema evolution across the cleaned tail follows when
    // [[Evolution]] allows it, exactly like the incremental path.
    // Compared MODULO typeChanges versions (see [[sync]]): the mirror's
    // followed-widening record carries graft's version, the source's the
    // Delta version — same types, not an evolution.
    val evolvedSync = graft.log.TypeWidening.ignoringChangeVersions(incoming) !=
      graft.log.TypeWidening.ignoringChangeVersions(schema)
    if (evolvedSync) {
      require(mapped == sourceMapped,
        "the Delta source's schema changed across the cleaned tail AND " +
          "the column-mapping mode differs between source and mirror — " +
          "re-import")
      Evolution.requireFollowable(schema, incoming, mapped, "Delta")
    }
    val graftLive: Set[String] = snap0.files.map(_.path).toSet
    val currentLive: Set[String] = st.adds.keySet.toSet
    val newEntries = st.adds.toSeq.filterNot { case (p, _) => graftLive(p) }
    val removed = (graftLive -- currentLive).toSeq
    if (mapped && newEntries.nonEmpty)
      verifyFooterIds(root, newEntries.map(_._1), incoming, physicalOf)
    val now = System.currentTimeMillis()
    // heal tags across the cleaned tail (r14): an unchanged schema means
    // every new file was written under the CURRENT types (widenings are
    // monotonic, so equal endpoint schemas imply no in-tail type change) —
    // tag for stat/bloom heal like the incremental path; an evolved tail
    // cannot resolve per-file eras from a checkpoint, so it stays
    // conservatively untagged
    val diffTags: Map[String, String] =
      if (evolvedSync) Map.empty
      else schema.fields
        .filter(f => graft.log.TypeWidening.hasChanges(f) ||
          graft.log.TypeWidening.nameReused(f))
        .map(f => graft.log.TypeWidening.tagKey(f) ->
          graft.log.TypeWidening.changeCount(f).toString).toMap
    val newAdds: Seq[graft.log.Action] =
      toAddFiles(spark, root, newEntries, incoming, physicalOf, diffTags)
    // the FULL current mask state rebuilds (O(current masked positions) —
    // the price of the lost tail, paid once); vanished masks clear
    val dvActions = importDvActions(spark, root,
      st.adds.toSeq.collect { case (p, i) if i.dv.isDefined => p -> i.dv.get })
    try {
      t.commitWithRetry("DELTA SYNC",
        Map("fromVersion" -> from.toString,
          "toVersion" -> st.sourceVersion.toString,
          "mode" -> "snapshot-diff"),
        snap0,
        Map("numAddedFiles" -> newAdds.size.toLong,
          "numRemovedFiles" -> removed.size.toLong)) { s =>
        if (s.metadata.properties.get(SourceVersionKey)
            .exists(_.toLong >= st.sourceVersion))
          throw new LakeTable.EpochAlreadyCommitted
        SyncGuard.requireNotDiverged(s.commits, syncOps, "Delta")
        SyncGuard.requireNoConstraintsForAdds(s.metadata.properties,
          newAdds.size.toLong, "Delta")
        val liveNow = s.files.map(_.path).toSet
        val maskedNow = dvActions.map(_.forFile).toSet
        val clears = s.dvs.keys
          .filterNot(maskedNow).filter(currentLive.contains)
          .map(p => graft.log.DeletionVector(p, "", 0L)).toSeq
        val (mergedJson, retireProp) =
          if (!evolvedSync) (s.metadata.schemaJson, Map.empty[String, String])
          else {
            val (m, rp) = Evolution.mergedSchema(s.schema, incoming, mapped,
              s.metadata.properties, s.version + 1)
            (m.json, rp)
          }
        val maxIdProp: Map[String, String] =
          if (!mapped || !evolvedSync) Map.empty
          else Map(graft.log.ColumnIds.MaxIdKey -> math.max(
            s.metadata.properties.get(graft.log.ColumnIds.MaxIdKey)
              .map(_.toLong).getOrElse(0L),
            math.max(
              st.configuration.get("delta.columnMapping.maxColumnId")
                .map(_.toLong).getOrElse(0L),
              graft.log.ColumnIds.maxId(Map.empty, incoming))).toString)
        val meta = s.metadata.copy(schemaJson = mergedJson,
          properties = s.metadata.properties ++
          LakeTable.normalizeProps(st.configuration) ++ maxIdProp ++
          retireProp +
          (SourceVersionKey -> st.sourceVersion.toString))
        val proto = graft.log.Protocol.merge(
          graft.log.Protocol.merge(s.protocol,
            LakeTable.impliedFeatures(meta.properties)),
          if (dvActions.isEmpty) s.protocol
          else graft.log.Protocol(1, 1, null, Seq("deletionVectors")))
        (if (proto == s.protocol) Seq(meta) else Seq(proto, meta)) ++
          newAdds ++ dvActions ++ clears ++
          removed.filter(liveNow.contains)
            .map(p => graft.log.RemoveFile(p, now))
      }
    } catch { case _: LakeTable.EpochAlreadyCommitted => () }
    t.version
  }

  /** One live add's replayed attributes. `era` counts the REAL in-range
    * schema changes seen before this add was (last) written — [[sync]]'s
    * per-file stat-era resolution (adds at the final era tag for heal;
    * earlier eras stay conservatively untagged). */
  private case class AddInfo(size: Long, mtime: Long, statsJson: Option[String],
      dv: Option[DvDescriptor], partitionValues: Map[String, String],
      era: Int = 0)

  /** The Delta table's replayed live state. */
  private case class ReplayedState(
      tableId: String, schemaString: String,
      configuration: Map[String, String], partitionColumns: Seq[String],
      minReader: Int, readerFeatures: Set[String], sourceVersion: Long,
      adds: mutable.LinkedHashMap[String, AddInfo])

  /** Import `<dir>`'s Delta log as a graft table IN PLACE (idempotent: an
    * already-imported directory returns the existing graft table). */
  def convert(spark: SparkSession, dir: String): LakeTable = {
    if (TxLog.isTable(dir)) return LakeTable.forPath(spark, dir)
    val root = Paths.get(dir)
    val st = replay(spark, root)
    // ---- honesty gates ----
    require(st.partitionColumns.isEmpty,
      s"$dir is a PARTITIONED Delta table (partition columns " +
        s"${st.partitionColumns.mkString(", ")} live only in the log, not " +
        "the data files) — import with convertRewrite instead")
    gate(dir, st)

    val mappingMode = st.configuration.getOrElse("delta.columnMapping.mode", "none")
    val (schema, physicalOf) = {
      val (s0, phys) =
        if (mappingMode == "none")
          (DataType.fromJson(st.schemaString).asInstanceOf[StructType],
            Map.empty[String, String])
        else {
          // id/name modes both translate to graft's by-field-id resolution
          // (the files' footers are verified to support it — an id-less file
          // refuses here, pointing at the rewrite import)
          val (s, phys0) = translateMapping(
            DataType.fromJson(st.schemaString).asInstanceOf[StructType])
          verifyFooterIds(root, st.adds.keys.toSeq, s, phys0)
          (s, phys0)
        }
      (translateTypeChanges(s0), phys)
    }
    val now = System.currentTimeMillis()
    val graftAdds: Seq[AddFile] =
      toAddFiles(spark, root, st.adds.toSeq, schema, physicalOf)
    // live Delta deletion vectors transcode into graft masks (one dv
    // parquet + one DeletionVector action per masked file); written before
    // the commit — a lost CAS leaves an orphan parquet, never a bad commit
    val dvActions = importDvActions(spark, root,
      st.adds.toSeq.collect { case (p, i) if i.dv.isDefined => p -> i.dv.get })

    // ---- one graft commit materializing the live snapshot ----
    // a mapped import records the id high-water mark so graft-side ADD
    // COLUMN never reuses a retired Delta id (same never-reuse rule)
    val maxIdProp: Map[String, String] =
      if (mappingMode == "none") Map.empty
      else Map(graft.log.ColumnIds.MaxIdKey -> math.max(
        st.configuration.get("delta.columnMapping.maxColumnId")
          .map(_.toLong).getOrElse(0L),
        graft.log.ColumnIds.maxId(Map.empty, schema)).toString)
    // a pre-widened source (translated delta.typeChanges present) keeps
    // the widening enabled so the feature stamps even when the source
    // unset the property after applying changes
    val widenProp: Map[String, String] =
      if (schema.fields.exists(graft.log.TypeWidening.hasChanges))
        Map("graft.enableTypeWidening" -> "true")
      else Map.empty
    val meta = graft.log.Metadata(st.tableId, root.getFileName.toString,
      schema.json, Nil,
      // delta.* table properties carry over under the engine's own
      // delta-prefix normalization (appendOnly, retention windows, …);
      // the consumed source version rides as a property so [[sync]] can
      // pick up exactly where the import stopped
      LakeTable.normalizeProps(st.configuration) ++ maxIdProp ++ widenProp +
        (SourceVersionKey -> st.sourceVersion.toString), now)
    val ci = CommitInfo(0L, now, "CONVERT",
      Map("numFiles" -> graftAdds.size.toString,
        "sourceFormat" -> "delta",
        "numDeletionVectors" -> dvActions.size.toString,
        "sourceVersion" -> st.sourceVersion.toString), Map.empty, -1L,
      LakeTable.currentUser, false, java.util.UUID.randomUUID().toString)
    // property-implies-feature invariant: an imported
    // delta.enableChangeDataFeed / enableDeletionVectors / … must stamp
    // its table feature in the same commit, exactly as setProperties does;
    // imported masks stamp deletionVectors even without the property
    val proto = graft.log.Protocol.merge(
      graft.log.Protocol.merge(graft.log.Protocol.Current,
        LakeTable.impliedFeatures(meta.properties)),
      if (dvActions.isEmpty) graft.log.Protocol.Current
      else graft.log.Protocol(1, 1, null, Seq("deletionVectors")))
    val tlog = new TxLog(root)
    if (!tlog.tryCommit(0L, ci +: proto +: meta +: (graftAdds ++ dvActions)))
      return LakeTable.forPath(spark, dir) // lost a concurrent import: theirs won
    LakeTable.forPath(spark, dir)
  }

  /** Rewrite-import of a Delta table (partitioned, or any table the
    * zero-copy convert refuses for data-layout reasons) into a NEW graft table at
    * `destDir`: partition values live only in the Delta log (and directory
    * names), never in the data files, so a zero-copy import cannot work —
    * instead ONE scan reads every live file, a BROADCAST join attaches each
    * file's partition tuple from the log (`_metadata.file_path` keyed — no
    * shuffle of the data, no per-partition scan fan-out), values cast to
    * the schema's declared types, and the result writes as a native graft
    * table partitioned by the same columns. O(data) once — the migration
    * rewrite the in-place refusal points at. The same honesty gates apply
    * (DVs, column mapping, reader features).
    *
    * With `follow = true` the destination is built to be SYNCABLE by
    * [[syncRewrite]] — the convert/sync/cut-over story for partitioned
    * Delta sources: every rewritten row carries its source-file LINEAGE
    * ([[Rewrite.SrcFileCol]]: the log-relative data file;
    * [[Rewrite.SrcPosCol]]: the row's PHYSICAL position in it, before any
    * deletion-vector filtering — DV growth deletes by it later), the
    * consumed source version records in the table properties, and a
    * live-set ledger snapshot (path -> DV signature) writes under the
    * destination. The storage cost (a dictionary-encoded path plus a
    * delta-encoded long per row) is the price of followability; a
    * one-shot migration should keep the default `follow = false`. */
  def convertRewrite(spark: SparkSession, srcDir: String, destDir: String): LakeTable =
    convertRewrite(spark, srcDir, destDir, follow = false)

  def convertRewrite(spark: SparkSession, srcDir: String, destDir: String,
      follow: Boolean): LakeTable = {
    // absolutized + normalized: the join key below must match the path
    // strings Spark reports for the planned files, and a relative or
    // non-normalized srcDir would build keys NOTHING matches
    val root = Paths.get(srcDir).toAbsolutePath.normalize
    val st = replay(spark, root)
    // works for UNPARTITIONED sources too: the zero-copy convert is the
    // better path there, but id-less name-mode files refuse it (footer
    // gate) and this rewrite is their only remedy — the partition-tuple
    // join simply stands down
    gate(srcDir, st)
    val lay = rewriteLayoutOf(st)
    val lineageFields =
      if (!follow) Nil
      else {
        Seq(Rewrite.SrcFileCol, Rewrite.SrcPosCol).foreach { n =>
          require(!lay.destSchema.fieldNames.exists(_.equalsIgnoreCase(n)),
            s"source column '$n' collides with the lineage column a " +
              "followable rewrite adds — import with follow = false, or " +
              "rename the source column")
        }
        Seq(StructField(Rewrite.SrcFileCol, StringType),
          StructField(Rewrite.SrcPosCol, LongType))
      }
    val followProps: Map[String, String] =
      if (!follow) Map.empty
      else Map(RewriteFollowKey -> "true",
        RewriteSourceKey -> root.toString,
        SourceVersionKey -> st.sourceVersion.toString)
    // a fully deleted (or never-written) partitioned source imports as an
    // empty partitioned graft table — schema and layout are fully known
    if (st.adds.isEmpty) {
      if (follow)
        writeRwLedger(Paths.get(destDir).toAbsolutePath.normalize, st)
      return LakeTable.create(spark, destDir,
        StructType(lay.destSchema.fields ++ lineageFields),
        partitionColumns = lay.pcols, properties = lay.props ++ followProps,
        ifNotExists = false)
    }
    val typed = rewriteRows(spark, root, st, st.adds.toSeq, lay, follow)
    // createFrom/create use ifNotExists = false: a retried migration fails
    // LOUDLY on the existing destination instead of silently appending
    // the whole dataset a second time
    if (!follow)
      return LakeTable.createFrom(spark, destDir, typed,
        partitionColumns = lay.pcols, properties = lay.props)
    // the ledger snapshot writes BEFORE the data commit: a crash in
    // between leaves a stray ledger file (harmless — reads key on the
    // CONSUMED property) but never a synced table without its ledger
    writeRwLedger(Paths.get(destDir).toAbsolutePath.normalize, st)
    val dest = LakeTable.create(spark, destDir,
      StructType(lay.destSchema.fields ++ lineageFields),
      partitionColumns = lay.pcols, properties = lay.props ++ followProps,
      ifNotExists = false)
    dest.appendWithProps(typed, _ => Map.empty,
      Some(Rewrite.AppendAppId), Some(st.sourceVersion)): Unit
    dest
  }

  /** Incremental catch-up for a FOLLOWABLE rewrite destination
    * ([[convertRewrite]] with `follow = true`) — the continuous-migration
    * shape for the partitioned Delta sources the in-place [[sync]]
    * refuses:
    *
    *  1. source files REMOVED since the last sync become a lineage-keyed
    *     merge-DELETE (file stats on the lineage column prune the touched
    *     destination files);
    *  2. files whose DELETION VECTOR changed leave the same way and
    *     rewrite-append under the CURRENT vector — remove + re-add is the
    *     universally correct shape: it needs no old bitmap (covers DV
    *     growth, a RESTORE that shrank one, and a vacuumed-away sidecar)
    *     at O(changed file) cost instead of O(delta-mask);
    *  3. NEW files rewrite-append with their log partition tuples
    *     re-injected, advancing the consumed version in the SAME commit.
    *
    * Schema, partition-layout, and configuration evolutions stay CUT-OVER
    * refusals for a rewrite destination (unlike the in-place sync, which
    * follows some): its layout was derived from the import-time metadata.
    * Every step is idempotent (transaction-ledger keyed by the target
    * version; the ledger snapshot is name-keyed by it), so a crash
    * anywhere replays to the same state and a repeated sync no-ops.
    * Unlike the in-place sync (one net commit), a catch-up is up to two
    * destination commits; a reader between them can observe the
    * mid-sync state — time-travel to the pre-sync version if the read
    * must straddle a sync. Returns the destination's version. */
  def syncRewrite(spark: SparkSession, srcDir: String, destDir: String): Long = {
    import org.apache.spark.sql.functions.expr
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
    val consumed = props0(SourceVersionKey).toLong
    Rewrite.requireNotDiverged(dest, destDir)
    val st = replay(spark, root)
    if (st.sourceVersion <= consumed) return dest.version
    gate(srcDir, st)
    val lay = rewriteLayoutOf(st)
    require(lay.pcols == dest.snapshot().metadata.partitionColumns,
      s"the Delta source's partition columns changed " +
        s"(${lay.pcols.mkString(", ")}) — a rewrite destination cannot " +
        "follow a re-layout; re-import")
    val destDataTypes = dest.snapshot().schema.fields
      .filterNot(f => f.name == Rewrite.SrcFileCol ||
        f.name == Rewrite.SrcPosCol)
      .map(f => (f.name, f.dataType)).toSeq
    require(destDataTypes == lay.destSchema.fields
        .map(f => (f.name, f.dataType)).toSeq,
      s"the Delta source's schema changed — this evolution is a " +
        "cut-over moment for a rewrite destination; re-import")
    val prev = readRwLedger(destRoot, consumed).getOrElse(
      throw new IllegalStateException(
        s"$destDir carries no ledger snapshot for consumed version " +
          s"$consumed under ${destRoot.resolve(Rewrite.LedgerDir)} — the " +
          "followable-rewrite state is damaged; re-import"))
    val curSig: Map[String, String] = st.adds.view
      .mapValues(i => dvSignature(i.dv)).toMap
    val removed = prev.keysIterator.filterNot(curSig.contains).toSeq.sorted
    val dvChanged = curSig.collect {
      case (p, s) if prev.get(p).exists(_ != s) => p }.toSeq.sorted
    val newPaths = curSig.keysIterator.filterNot(prev.contains).toSeq.sorted
    // ledger snapshot for the NEW consumed point, before any mutation
    writeRwLedger(destRoot, st)
    // 1. removed files and DV-changed files (re-appended below) leave by
    // lineage
    val gone = removed ++ dvChanged
    if (gone.nonEmpty) {
      import spark.implicits._
      dest.merge(gone.toDF("rm_file"),
        expr(s"target.`${Rewrite.SrcFileCol}` = source.rm_file"))
        .whenMatchedDelete()
        .withTxn(Rewrite.RemoveAppId, st.sourceVersion)
        .execute(): Unit
    }
    // 2. new + DV-changed files rewrite-append + consumed state, one commit
    val back = dvChanged ++ newPaths
    val advance = Map(SourceVersionKey -> st.sourceVersion.toString)
    if (back.nonEmpty) {
      val subset = back.map(p => p -> st.adds(p))
      val typed = rewriteRows(spark, root, st, subset, lay, follow = true)
      dest.appendWithProps(typed, _ => advance,
        Some(Rewrite.AppendAppId), Some(st.sourceVersion)): Unit
    } else dest.setProperties(advance): Unit
    pruneRwLedgers(destRoot, consumed)
    dest.version
  }

  /** The rewrite destination's layout derived from the source metadata. */
  private case class DeltaRewriteLayout(
      physicalOf: Map[String, String], pcols: Seq[String],
      props: Map[String, String], destSchema: StructType) {
    def physName(logical: String): String = physicalOf.getOrElse(logical, logical)
    def dataFields: Seq[StructField] = destSchema.fields.toSeq.filterNot(f =>
      pcols.exists(_.equalsIgnoreCase(f.name)))
  }

  private def rewriteLayoutOf(st: ReplayedState): DeltaRewriteLayout = {
    // column-mapped sources rewrite fine: the scan resolves the files'
    // PHYSICAL column names (no field ids required — this is the remedy
    // for id-less name-mode files) and the projection restores logical
    // names; the destination is a fresh native table with its own ids
    val mappingMode = st.configuration.getOrElse("delta.columnMapping.mode", "none")
    val (schema, physicalOf) =
      if (mappingMode == "none")
        (DataType.fromJson(st.schemaString).asInstanceOf[StructType],
          Map.empty[String, String])
      else translateMapping(
        DataType.fromJson(st.schemaString).asInstanceOf[StructType])
    // the rewrite destination is NOT mapped to the source: drop the
    // source's mapping config and schema metadata (fresh ids stamp at
    // creation)
    val props = LakeTable.normalizeProps(st.configuration.view
      .filterKeys(!_.startsWith("delta.columnMapping.")).toMap)
    val destSchema = graft.log.ColumnIds.strip(StructType(schema.fields.map { f =>
      // the rewrite destination is written fresh under the CURRENT types:
      // neither the mapping's physical names nor the source's type-change
      // history carry over (new stats are exact by construction)
      f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).remove(MappingPhysKey)
        .remove(DeltaChangesKey).build())
    }))
    DeltaRewriteLayout(physicalOf, st.partitionColumns, props, destSchema)
  }

  /** The shared rewrite read over `subset` of the live files: scan by
    * PHYSICAL names, planned-vs-logged guard on exactly that subset, drop
    * DV-masked rows (two-tier), re-inject partition tuples from the log
    * via a broadcast file->tuple join, project to logical names — plus,
    * when `follow`, the lineage columns captured BEFORE the DV filter
    * (the physical row index is what later DV growth deletes by) and a
    * repartition by the partition columns with a within-partition sort on
    * the lineage file, keeping per-destination-file lineage min/max tight
    * so the sync's removal merges prune to the touched files. */
  private def rewriteRows(spark: SparkSession, root: Path, st: ReplayedState,
      subset: Seq[(String, AddInfo)], lay: DeltaRewriteLayout,
      follow: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val livePaths = subset.map(p => root.resolve(p._1).toString)
    // file -> partition tuple (log-authoritative, layout-independent)
    val pvSchema = StructType(
      StructField("__file", StringType) +:
        lay.pcols.map(c => StructField(s"__pv_$c", StringType)))
    val pvRows: java.util.List[org.apache.spark.sql.Row] =
      subset.map { case (p, info) =>
        org.apache.spark.sql.Row.fromSeq(
          root.resolve(p).toString +:
            // mapped logs key partition values by PHYSICAL name
            lay.pcols.map(c =>
              info.partitionValues.getOrElse(lay.physName(c), null)))
      }.asJava
    val pv = spark.createDataFrame(pvRows, pvSchema)
    // the scan asks for the files' PHYSICAL column names with NO field-id
    // metadata (by-name resolution — works on id-less files too)
    val readSchema = StructType(lay.dataFields.map(f =>
      StructField(lay.physName(f.name), f.dataType, f.nullable)))
    val raw0 = spark.read.schema(readSchema)
      .parquet(livePaths: _*)
      .withColumn("__file",
        graft.log.DvBitmap.stripPathCol(col("_metadata.file_path")))
    // loud pre-write guard (driver-only, no Spark job): every file the
    // scan plans must have a log tuple and vice versa — an inner join
    // silently dropping unmatched rows here would be total data loss,
    // the exact mis-read this module's gates exist to prevent
    val planned = raw0.inputFiles.map(Stats.stripScheme).toSet
    val logged = subset.iterator
      .map(p => Stats.stripScheme(root.resolve(p._1).toString)).toSet
    require(planned == logged,
      s"planned scan files diverge from the Delta log's live set " +
        s"(only-planned: ${(planned -- logged).take(3)}, " +
        s"only-logged: ${(logged -- planned).take(3)}) — refusing to " +
        "write a silently incomplete import")
    // live deletion vectors: masked positions must NOT materialize in the
    // rewrite — small mask totals broadcast per-file bitmaps probed by the
    // codegen'd filter; large ones explode to rows and anti-join (the same
    // two-tier strategy as the engine's own masked reads)
    val dvAdds = subset.collect {
      case (p, i) if i.dv.isDefined => p -> i.dv.get }
    val raw =
      if (dvAdds.isEmpty && !follow) raw0
      else raw0.withColumn("__idx", col("_metadata.row_index"))
    val unmasked =
      if (dvAdds.isEmpty) raw
      else {
        dvAdds.foreach { case (p, d) =>
          require(d.storageType == "u" || d.storageType == "i",
            s"deletion vector for $p has storageType '${d.storageType}' — " +
              "only file-relative ('u') and inline ('i') vectors can import")
        }
        val totalMasked = dvAdds.map(_._2.cardinality).sum
        val dvDf = decodeDvs(spark, root, dvAdds)
        if (totalMasked <= graft.log.DvBitmap.broadcastMaxMasks(spark)) {
          val bc = spark.sparkContext.broadcast(
            dvDf.collect().map(r =>
              r.getString(0) -> r.getAs[Array[Byte]](1)).toMap)
          raw.filter(graft.log.DvBitmap.notMasked(
            col("__file"), col("__idx"), bc, totalMasked))
        } else {
          val maskRows = dvDf.select(col("__path"),
            org.apache.spark.sql.functions.explode(
              graft.log.DvBitmap.toLongArray(col("__bitmap"))).as("__midx"))
          raw.join(maskRows,
            raw("__file") === maskRows("__path") &&
              raw("__idx") === maskRows("__midx"), "left_anti")
        }
      }
    val joined =
      if (lay.pcols.isEmpty) unmasked
      else unmasked.join(broadcast(pv), "__file")
    val rootPrefixLen = root.toString.length + 2 // 1-based, past the '/'
    val lineageCols =
      if (!follow) Nil
      else Seq(
        org.apache.spark.sql.functions
          .expr(s"substring(__file, $rootPrefixLen)").as(Rewrite.SrcFileCol),
        col("__idx").as(Rewrite.SrcPosCol))
    val typed = joined
      .select(lay.destSchema.fields.toSeq.map { f =>
        if (lay.pcols.exists(_.equalsIgnoreCase(f.name)))
          col(s"__pv_${f.name}").cast(f.dataType).as(f.name)
        else col(lay.physName(f.name)).as(f.name) // physical -> logical
      } ++ lineageCols: _*)
    if (!follow) typed
    else {
      // shuffle by (partition columns, SOURCE FILE) so destination files
      // are lineage-CLUSTERED (whole source files per shuffle task,
      // modulo hash collisions; the sort keeps each source contiguous) —
      // the sync's removal merges and DV-changed re-imports rewrite only
      // the files carrying the touched sources, not the table; file
      // count is bounded by the source's own file-per-partition overlap
      // (~1 for partition-aligned sources)
      val keys = lay.pcols.map(col) :+ col(Rewrite.SrcFileCol)
      typed.repartition(keys: _*).sortWithinPartitions(keys: _*)
    }
  }

  /** A deletion vector's identity for ledger diffing: any change in the
    * descriptor (growth, restore-shrink, or relocation) re-imports the
    * file. */
  private def dvSignature(dv: Option[DvDescriptor]): String =
    dv.map(d => s"${d.storageType}|${d.pathOrInlineDv}|${d.offset}|" +
      s"${d.sizeInBytes}|${d.cardinality}").getOrElse("")

  /** One JSON snapshot of the source's live set (log-relative path -> DV
    * signature) per consumed version:
    * `_graft_import/ledger-<version>.json` under the destination.
    * Name-keyed by the consumed version and derived from one replayed
    * state, so a crash-replay rewrites identical content. */
  private def writeRwLedger(destRoot: Path, st: ReplayedState): Unit = {
    val node = mapper.createObjectNode()
    val files = node.putObject("dataFiles")
    st.adds.toSeq.sortBy(_._1).foreach { case (p, i) =>
      files.put(p, dvSignature(i.dv)): Unit }
    store.writeAtomic(
      destRoot.resolve(Rewrite.LedgerDir)
        .resolve(s"ledger-${st.sourceVersion}.json"),
      mapper.writeValueAsBytes(node), overwrite = true)
  }

  private def readRwLedger(destRoot: Path, version: Long)
      : Option[Map[String, String]] = {
    val p = destRoot.resolve(Rewrite.LedgerDir).resolve(s"ledger-$version.json")
    if (!store.listFileNames(p.getParent).contains(p.getFileName.toString))
      return None
    val j = mapper.readTree(
      new String(store.readBytes(p), StandardCharsets.UTF_8))
    val files = j.get("dataFiles")
    val out = Map.newBuilder[String, String]
    files.fieldNames().asScala.foreach(n => out += (n -> files.get(n).asText()))
    Some(out.result())
  }

  /** Drop ledger snapshots STRICTLY OLDER than the previous consumed
    * version (current and previous stay — the previous one covers a sync
    * that crashed between ledger write and commit). Best-effort. */
  private def pruneRwLedgers(destRoot: Path, keepFrom: Long): Unit = {
    val dir = destRoot.resolve(Rewrite.LedgerDir)
    val re = raw"ledger-(\d+)\.json".r
    store.listFileNames(dir).foreach {
      case n @ re(v) if v.toLong < keepFrom =>
        scala.util.Try(store.delete(dir.resolve(n))): Unit
      case _ => ()
    }
  }

  /** Shared honesty gates over a replayed state (everything except the
    * partitioning decision, which differs between the two imports). */
  private def gate(dir: String, st: ReplayedState): Unit = {
    val mappingMode = st.configuration.getOrElse("delta.columnMapping.mode", "none")
    require(Set("none", "id", "name").contains(mappingMode),
      s"$dir uses unknown column mapping mode '$mappingMode' — only " +
        "none/id/name are specified")
    // live deletion vectors IMPORT (transcoded to graft masks) — but only
    // spec-shaped ones: an absolute-path ('p') vector does not live under
    // the table root, so it refuses like an absolute add path
    st.adds.valuesIterator.flatMap(_.dv).foreach(d =>
      require(d.storageType == "u" || d.storageType == "i",
        s"$dir carries a deletion vector with storageType " +
          s"'${d.storageType}' — only file-relative ('u') and inline " +
          "('i') vectors live under the table root and can import"))
    val unknown = st.readerFeatures -- SupportedReaderFeatures
    require(st.minReader <= 3 && unknown.isEmpty,
      s"$dir requires Delta reader version ${st.minReader} with feature(s) " +
        s"${unknown.toSeq.sorted.mkString(", ")} this importer does not honor")
  }

  /** Live adds -> graft AddFiles with exact-only stats + footer fallback.
    * `physicalOf` (logical -> physical column name) is non-empty for
    * column-mapped tables: the log's stats JSON and the files' footers are
    * keyed by PHYSICAL names there; graft stats key by logical. */
  private def toAddFiles(spark: SparkSession, root: Path,
      adds: Seq[(String, AddInfo)],
      schema: StructType,
      physicalOf: Map[String, String] = Map.empty,
      tags: Map[String, String] = Map.empty): Seq[AddFile] = {
    def physName(logical: String) = physicalOf.getOrElse(logical, logical)
    val statless = adds.collect {
      case (p, i) if i.statsJson.isEmpty => root.resolve(p) }.toSeq
    val footerSchema =
      if (physicalOf.isEmpty) schema
      else StructType(schema.fields.map(f => f.copy(name = physName(f.name))))
    val logicalOf = schema.fields.map(f => physName(f.name) -> f.name).toMap
    val footerStats: Map[String, (Long, Map[String, ColStats])] =
      if (statless.isEmpty) Map.empty
      else Stats.fromFooters(statless, footerSchema).map { case (p, (n, st)) =>
        p -> (n, st.map { case (k, v) => logicalOf.getOrElse(k, k) -> v })
      }
    adds.toSeq.map { case (path, info) =>
      val (numRecords, colStats) =
        info.statsJson.map(parseDeltaStats(_, schema, physicalOf))
          .filter(_._1 >= 0)
          .getOrElse(footerStats.get(root.resolve(path).toString)
            .getOrElse((spark.read.parquet(root.resolve(path).toString).count(),
              Map.empty[String, ColStats])))
      AddFile(path = path, partitionValues = Map.empty, size = info.size,
        numRecords = numRecords, stats = colStats,
        modificationTime = info.mtime,
        tags = if (tags.isEmpty) null else tags)
    }
  }

  private val MappingIdKey = "delta.columnMapping.id"
  private val MappingPhysKey = "delta.columnMapping.physicalName"

  /** Translate a column-mapped Delta schema into the engine's native
    * by-field-id form: logical names keep, each `delta.columnMapping.id`
    * becomes the `parquet.field.id` graft's own mapped tables resolve by
    * ([[graft.log.ColumnIds]]), and `delta.columnMapping.*` metadata
    * strips (recursively — nested struct fields carry ids too). Returns
    * the graft schema plus the logical -> physical top-level name map
    * (the log keys stats and partition values by PHYSICAL name). Works
    * for both `id` and `name` modes: resolution is by id either way, and
    * [[verifyFooterIds]] proves the files support it. */
  private[migrate] def translateMapping(
      deltaSchema: StructType): (StructType, Map[String, String]) = {
    // the id key strips (replaced by parquet.field.id); physicalName KEEPS
    // riding the graft schema — [[sync]] recovers the logical->physical
    // map from it when later Delta commits arrive with physically-keyed
    // stats and partition values
    def strip(m: org.apache.spark.sql.types.Metadata) = {
      val mb = new org.apache.spark.sql.types.MetadataBuilder().withMetadata(m)
      mb.remove(MappingIdKey).build()
    }
    def walkType(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(walkField))
      case a: ArrayType => a.copy(elementType = walkType(a.elementType))
      case m: MapType => m.copy(keyType = walkType(m.keyType),
        valueType = walkType(m.valueType))
      case other => other
    }
    def walkField(f: StructField): StructField = {
      require(f.metadata.contains(MappingIdKey),
        s"column-mapped schema field '${f.name}' carries no " +
          s"$MappingIdKey — cannot translate")
      val id = f.metadata.getLong(MappingIdKey)
      graft.log.ColumnIds.withId(
        f.copy(dataType = walkType(f.dataType), metadata = strip(f.metadata)), id)
    }
    (StructType(deltaSchema.fields.map(walkField)),
      physicalNamesOf(deltaSchema))
  }

  /** logical -> physical top-level name map from MappingPhysKey field
    * metadata (identity for fields without it) — shared by import-time
    * translation, the sync's stats/footer binding, and the evolved-schema
    * rebinding, so the three can never silently diverge. */
  private def physicalNamesOf(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name ->
      (if (f.metadata.contains(MappingPhysKey))
        f.metadata.getString(MappingPhysKey) else f.name)).toMap

  private val DeltaChangesKey = "delta.typeChanges"

  /** Delta's per-field type-widening record translates onto graft's
    * (`graft.typeChanges`) so stat/bloom honesty survives the import: a
    * source that widened float→double BEFORE the import has files whose
    * float-encoded stats are NOT exact double bounds — without the
    * record, metadata-only min/max would trust them. Type-name spellings
    * map from Delta's schema-serialization names to the DDL forms
    * graft's change parser reads (an unmapped spelling would silently
    * drop the entry — and with it the distrust). */
  private[migrate] def translateTypeChanges(schema: StructType): StructType = {
    def ddlOf(t: String): String = t match {
      case "long" => "BIGINT"
      case "integer" => "INT"
      case "short" => "SMALLINT"
      case "byte" => "TINYINT"
      case "timestampNtz" => "TIMESTAMP_NTZ"
      case other => other // float/double/date/decimal(p,s) parse as-is
    }
    StructType(schema.fields.map { f =>
      if (!f.metadata.contains(DeltaChangesKey)) f
      else {
        val translated = f.metadata.getMetadataArray(DeltaChangesKey).map { e =>
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .putString("fromType", ddlOf(e.getString("fromType")))
            .putString("toType", ddlOf(e.getString("toType")))
          (if (e.contains("tableVersion"))
            mb.putLong("tableVersion", e.getLong("tableVersion")) else mb)
            .build()
        }
        val prior =
          if (f.metadata.contains(graft.log.TypeWidening.ChangesKey))
            f.metadata.getMetadataArray(graft.log.TypeWidening.ChangesKey)
          else Array.empty[org.apache.spark.sql.types.Metadata]
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).remove(DeltaChangesKey)
          .putMetadataArray(graft.log.TypeWidening.ChangesKey,
            prior ++ translated)
          .build())
      }
    })
  }

  /** Column-mapping honesty gate over the LIVE files' parquet footers:
    * by-id reads are only safe when (a) every footer column carries a
    * field id (a file upgraded into `name` mode without ids would read
    * silently NULL or throw at query time — refuse at import instead),
    * (b) a footer column matching a live physical name carries THAT
    * column's id, and (c) no footer id collides with a different live
    * column's id (ids are never reused, but a hand-crafted log could).
    * Footer cost: one open per live file; only STAT-LESS adds (rare in
    * real Delta logs — writers embed stats) pay a second open later in
    * toAddFiles' fallback. */
  private def verifyFooterIds(root: Path, live: Seq[String],
      schema: StructType, physicalOf: Map[String, String]): Unit = {
    val idOfPhys: Map[String, Long] = schema.fields.map(f =>
      physicalOf.getOrElse(f.name, f.name) ->
        graft.log.ColumnIds.idOf(f).get).toMap
    val footers = Stats.footerFieldIds(live.map(root.resolve))
    live.foreach { p =>
      val cols = footers(root.resolve(p).toString)
      cols.foreach { case (name, id) =>
        require(id.isDefined,
          s"column-mapped import: file $p column '$name' carries no " +
            "parquet field id — by-id resolution would be undefined; " +
            "rewrite the file (or import with convertRewrite)")
        idOfPhys.get(name) match {
          case Some(expect) => require(id.get.toLong == expect,
            s"file $p column '$name' has field id ${id.get}, the mapped " +
              s"schema says $expect — refusing a mis-binding read")
          case None => require(!idOfPhys.values.exists(_ == id.get.toLong),
            s"file $p column '$name' (not in the live schema) reuses " +
              s"live field id ${id.get} — by-id reads would bind its bytes")
        }
      }
    }
  }

  /** Decode the given live adds' Delta DV descriptors and persist them as
    * ONE graft dv parquet under the table root; returns the
    * [[graft.log.DeletionVector]] actions pointing at it. The decode is
    * DISTRIBUTED: descriptors (tiny — a path, offsets, a cardinality)
    * parallelize to executors, each does the ranged sidecar read through
    * the Hadoop FileSystem API (object-store capable) plus the
    * bitmap-to-bitmap transcode, so import cost is O(DV bytes) spread
    * across the cluster, never a driver bottleneck or a position
    * explosion. */
  private def importDvActions(spark: SparkSession, root: Path,
      dvAdds: Seq[(String, DvDescriptor)]): Seq[graft.log.DeletionVector] = {
    if (dvAdds.isEmpty) return Nil
    dvAdds.foreach { case (p, d) =>
      require(d.storageType == "u" || d.storageType == "i",
        s"deletion vector for $p has storageType '${d.storageType}' — " +
          "only file-relative ('u') and inline ('i') vectors can import")
    }
    val absRoot = root.toAbsolutePath.normalize
    val rel = s"dv/import-${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
    decodeDvs(spark, absRoot, dvAdds)
      .write.mode("errorifexists").parquet(absRoot.resolve(rel).toString)
    dvAdds.map { case (p, d) => graft.log.DeletionVector(p, rel, d.cardinality) }
  }

  /** Distributed descriptor decode: one row per masked file —
    * (`__path` canonical absolute data-file path, `__bitmap` the
    * graft-serialized 64-bit roaring mask, `__n` cardinality) — graft's
    * own dv parquet shape. Every decoded bitmap's cardinality is verified
    * against its descriptor (a mismatch is corruption, refused loudly). */
  private[migrate] def decodeDvs(spark: SparkSession, absRoot: Path,
      dvAdds: Seq[(String, DvDescriptor)]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rootStr = absRoot.toString
    val rows = dvAdds.map { case (p, d) =>
      (absRoot.resolve(p).toString, d.storageType, d.pathOrInlineDv,
        d.offset, d.sizeInBytes, d.cardinality)
    }
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val slices = math.max(1, math.min(rows.size, 32))
    spark.createDataset(rows).repartition(slices).mapPartitions { it =>
      val conf = bc.value.value
      it.map { case (file, st, enc, off, size, card) =>
        val d = DvDescriptor(st, enc, off, size, card)
        val bm = DeltaDv.toRoaring64(DeltaDv.readData(rootStr, d, conf))
        require(bm.getLongCardinality == card,
          s"deletion vector for $file decodes to ${bm.getLongCardinality} " +
            s"positions but its descriptor says $card — refusing a " +
            "corrupt mask")
        (file, graft.log.DvBitmap.serialize(bm), card)
      }
    }.toDF("__path", "__bitmap", "__n")
  }

  /** Replay `<root>`'s Delta log (checkpoint base + JSON tail) into the
    * live table state. */
  private def replay(spark: SparkSession, root: Path): ReplayedState = {
    val logDir = root.resolve("_delta_log")

    // ---- log layout: checkpoint base + JSON tail ----
    val entries = store.listFileNames(logDir)
    require(entries.nonEmpty, s"no _delta_log under $root")
    val jsonRe = raw"(\d{20})\.json".r
    val jsonVersions = entries.collect { case jsonRe(v) => v.toLong }.sorted
    val lastCheckpoint: Option[(Long, Int)] =
      scala.util.Try {
        val n = mapper.readTree(new String(store.readBytes(
          logDir.resolve("_last_checkpoint")), StandardCharsets.UTF_8))
        val v = n.get("version").asLong()
        val parts = Option(n.get("parts")).map(_.asInt()).getOrElse(1)
        (v, parts)
      }.toOption
    val cpVersion = lastCheckpoint.map(_._1)
    val tail = jsonVersions.filter(v => cpVersion.forall(v > _))
    // replay needs an unbroken chain: from v0 without a checkpoint, from
    // checkpoint+1 with one (Delta's own log-retention cleanup deletes
    // pre-checkpoint JSON, which is fine — the checkpoint carries them)
    val expectedStart = cpVersion.map(_ + 1).getOrElse(0L)
    require(tail.isEmpty || (tail.head == expectedStart &&
      tail.zip(tail.tail).forall { case (a, b) => b == a + 1 }),
      s"broken Delta log chain under $logDir: have versions $tail, " +
        s"expected contiguous from $expectedStart " +
        "(missing commits cannot be replayed)")
    require(cpVersion.nonEmpty || jsonVersions.headOption.contains(0L),
      s"Delta log under $logDir has no checkpoint and does not start at " +
        "version 0 — the table state cannot be reconstructed")
    val sourceVersion = (cpVersion.toList ++ tail).max

    // ---- state replay ----
    var schemaString: String = null
    var configuration: Map[String, String] = Map.empty
    var partitionColumns: Seq[String] = Nil
    var tableId: String = java.util.UUID.randomUUID().toString
    var minReader = 1
    var readerFeatures = Set.empty[String]
    val adds = mutable.LinkedHashMap.empty[String, AddInfo]

    def applyAdd(path: String, size: Long, mtime: Long,
        stats: Option[String], dv: Option[DvDescriptor],
        pv: Map[String, String]): Unit =
      adds.update(decodePath(path), AddInfo(size, mtime, stats, dv, pv)): Unit
    def applyRemove(path: String): Unit = adds.remove(decodePath(path)): Unit
    def applyMeta(id: String, schema: String, pcols: Seq[String],
        conf: Map[String, String]): Unit = {
      tableId = id; schemaString = schema
      partitionColumns = pcols; configuration = conf
    }

    // JSON-node appliers, shared by the commit tail and v2 JSON manifests
    def applyMetaNode(m: JsonNode): Unit =
      applyMeta(m.get("id").asText(), m.get("schemaString").asText(),
        Option(m.get("partitionColumns")).map(_.elements().asScala
          .map(_.asText()).toSeq).getOrElse(Nil),
        Option(m.get("configuration")).map(c => c.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty))
    def applyProtoNode(p: JsonNode): Unit = {
      minReader = p.get("minReaderVersion").asInt()
      readerFeatures = Option(p.get("readerFeatures"))
        .map(_.elements().asScala.map(_.asText()).toSet)
        .getOrElse(Set.empty)
    }
    def applyAddNode(a: JsonNode): Unit =
      applyAdd(a.get("path").asText(), a.get("size").asLong(),
        a.get("modificationTime").asLong(),
        Option(a.get("stats")).filterNot(_.isNull).map(_.asText()),
        dvOf(a),
        Option(a.get("partitionValues")).map(pvn =>
          pvn.properties().asScala.map(e => e.getKey ->
            (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
          .getOrElse(Map.empty))

    // One parquet action batch — classic checkpoint part(s), a v2
    // manifest, or v2 sidecar files — applied in ONE pass (per-action
    // selects would rescan the potentially multi-million-row metadata
    // parquet per kind). Returns the sidecar file names a v2 manifest
    // references; sidecar files themselves must not nest further.
    def readActionsParquet(paths: Seq[String], sidecarsAllowed: Boolean): Seq[String] = {
      val cp = spark.read.parquet(paths: _*)
      val cols = cp.columns.toSet
      require(sidecarsAllowed || !cols.contains("sidecar"),
        s"a checkpoint sidecar under $logDir references further sidecars " +
          "— malformed (the spec allows one level)")
      val sidecars = mutable.Buffer.empty[String]
      import org.apache.spark.sql.functions.col
      val want = Seq("metaData", "protocol", "add", "sidecar").filter(cols.contains)
      // toLocalIterator, not collect: a 10M-file source checkpoint is GBs
      // of Row objects — stream it one partition at a time so the driver
      // holds only the compact AddInfo state it is building, never the
      // full raw action set (r12 verdict: the last eager O(#files)
      // driver materialization in the import story)
      cp.select(want.map(col): _*).toLocalIterator().asScala.foreach { r =>
        want.zipWithIndex.foreach { case (name, i) =>
          if (!r.isNullAt(i)) name match {
            case "metaData" =>
              val m = r.getStruct(i)
              applyMeta(m.getAs[String]("id"), m.getAs[String]("schemaString"),
                m.getAs[scala.collection.Seq[String]]("partitionColumns").toSeq,
                Option(m.getAs[scala.collection.Map[String, String]]("configuration"))
                  .map(_.toMap).getOrElse(Map.empty))
            case "protocol" =>
              val p = r.getStruct(i)
              minReader = p.getAs[Int]("minReaderVersion")
              readerFeatures =
                if (p.schema.fieldNames.contains("readerFeatures"))
                  Option(p.getAs[scala.collection.Seq[String]]("readerFeatures"))
                    .map(_.toSet).getOrElse(Set.empty)
                else Set.empty
            case "add" =>
              val a = r.getStruct(i)
              val hasStats = a.schema.fieldNames.contains("stats")
              val dv: Option[DvDescriptor] =
                if (!a.schema.fieldNames.contains("deletionVector")) None
                else Option(a.getAs[org.apache.spark.sql.Row]("deletionVector"))
                  .map(d => DvDescriptor(
                    d.getAs[String]("storageType"),
                    d.getAs[String]("pathOrInlineDv"),
                    Option(d.getAs[Any]("offset"))
                      .map(_.asInstanceOf[Number].intValue()).getOrElse(0),
                    d.getAs[Number]("sizeInBytes").intValue(),
                    d.getAs[Number]("cardinality").longValue()))
              applyAdd(a.getAs[String]("path"), a.getAs[Long]("size"),
                a.getAs[Long]("modificationTime"),
                if (hasStats) Option(a.getAs[String]("stats")) else None,
                dv,
                Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
                  .map(_.toMap).getOrElse(Map.empty))
            case "sidecar" =>
              sidecars += r.getStruct(i).getAs[String]("path")
          }
        }
      }
      // checkpoint removes are expired-tombstone bookkeeping — the live
      // add set is complete without them
      sidecars.toSeq
    }

    // checkpoint base: classic parquet (single or multi-part), a v2
    // UUID-named manifest (json or parquet), or a classic-named v2 (the
    // spec's compat shape) — all resolve from the directory listing, so a
    // v2 pointer never hits a misleading missing-classic-file error
    lastCheckpoint.foreach { case (v, parts) =>
      val singleName = f"$v%020d.checkpoint.parquet"
      val multiNames =
        (1 to parts).map(i => f"$v%020d.checkpoint.$i%010d.$parts%010d.parquet")
      val v2Re = (f"$v%020d" + raw"\.checkpoint\.[A-Za-z0-9-]+\.(json|parquet)").r
      val v2Names = entries.filter(n => v2Re.pattern.matcher(n).matches()).sorted
      val sidecarRefs: Seq[String] =
        if (entries.contains(singleName))
          readActionsParquet(Seq(logDir.resolve(singleName).toString),
            sidecarsAllowed = true)
        else if (parts > 1 && multiNames.forall(entries.contains))
          readActionsParquet(multiNames.map(logDir.resolve(_).toString),
            sidecarsAllowed = true)
        else if (v2Names.nonEmpty) {
          val chosen = v2Names.last // any complete manifest works; pin one
          if (chosen.endsWith(".parquet"))
            readActionsParquet(Seq(logDir.resolve(chosen).toString),
              sidecarsAllowed = true)
          else {
            // v2 JSON manifest: newline-delimited actions
            val sidecars = mutable.Buffer.empty[String]
            new String(store.readBytes(logDir.resolve(chosen)),
              StandardCharsets.UTF_8)
              .split("\n").filter(_.trim.nonEmpty).foreach { line =>
                val n = mapper.readTree(line)
                if (n.has("metaData")) applyMetaNode(n.get("metaData"))
                if (n.has("protocol")) applyProtoNode(n.get("protocol"))
                if (n.has("add")) applyAddNode(n.get("add"))
                if (n.has("sidecar"))
                  sidecars += n.get("sidecar").get("path").asText()
              }
            sidecars.toSeq
          }
        } else {
          throw new IllegalArgumentException(
            s"_last_checkpoint names version $v but no classic or v2 " +
              s"checkpoint file exists under $logDir — cannot reconstruct state")
        }
      if (sidecarRefs.nonEmpty) {
        val paths = sidecarRefs.map { p =>
          // the spec writes plain UUID file names under _delta_log/_sidecars
          require(!p.contains("/") && !p.contains(":"),
            s"checkpoint sidecar path '$p' is not a plain file name under " +
              "_delta_log/_sidecars — cannot resolve safely")
          logDir.resolve("_sidecars").resolve(p).toString
        }
        readActionsParquet(paths, sidecarsAllowed = false): Unit
      }
    }

    // JSON tail, in order
    tail.foreach { v =>
      val lines = new String(store.readBytes(
        logDir.resolve(f"$v%020d.json")), StandardCharsets.UTF_8)
        .split("\n").filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("metaData")) applyMetaNode(n.get("metaData"))
        if (n.has("protocol")) applyProtoNode(n.get("protocol"))
        if (n.has("add")) applyAddNode(n.get("add"))
        if (n.has("remove")) applyRemove(n.get("remove").get("path").asText())
      }
    }
    require(schemaString != null, s"no metaData action found under $logDir")
    ReplayedState(tableId, schemaString, configuration, partitionColumns,
      minReader, readerFeatures, sourceVersion, adds)
  }

  /** Parse an add action's `deletionVector` descriptor, if present. */
  private def dvOf(add: JsonNode): Option[DvDescriptor] =
    Option(add.get("deletionVector")).filterNot(_.isNull).map { d =>
      DvDescriptor(
        d.get("storageType").asText(),
        d.get("pathOrInlineDv").asText(),
        Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()).getOrElse(0),
        d.get("sizeInBytes").asInt(),
        d.get("cardinality").asLong())
    }

  /** Delta add.path is a percent-encoded relative URI. Absolute or
    * scheme-ful paths (shallow clones, external locations) REFUSE: silently
    * stripping the scheme/authority would resolve to a wrong local path —
    * a FileNotFound at best, someone else's bytes at worst. */
  private def decodePath(p: String): String = {
    val uri = scala.util.Try(new java.net.URI(p)).toOption
    val decoded = uri.flatMap(u => Option(u.getPath)).filter(_.nonEmpty)
      .getOrElse(p)
    require(uri.forall(_.getScheme == null) && !decoded.startsWith("/"),
      s"Delta add path '$p' is absolute (a shallow clone or external " +
        "location) — its data does not live under this table root and " +
        "cannot import in place")
    decoded
  }

  /** Parse Delta's per-file stats JSON into (numRecords, canonical
    * ColStats), importing bounds only for types whose Delta encoding is
    * exact (see the scaladoc above). Returns numRecords = -1 when the
    * JSON carries none (caller falls back to footers). */
  private[migrate] def parseDeltaStats(
      statsJson: String, schema: StructType,
      physicalOf: Map[String, String] = Map.empty): (Long, Map[String, ColStats]) = {
    val n = mapper.readTree(statsJson)
    val numRecords =
      if (n.hasNonNull("numRecords")) n.get("numRecords").asLong() else -1L
    def boundsOf(section: String): Map[String, JsonNode] =
      Option(n.get(section)).map(s => s.properties().asScala
        .map(e => e.getKey -> e.getValue).toMap).getOrElse(Map.empty)
    val mins = boundsOf("minValues")
    val maxs = boundsOf("maxValues")
    val nullsNode = boundsOf("nullCount")
    def exact(dt: DataType, v: JsonNode): Option[String] = dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: FloatType | _: DoubleType | _: DecimalType =>
        // USE_BIG_DECIMAL_FOR_FLOATS: decimalValue is the exact literal
        Some(if (v.isNumber) v.decimalValue().toPlainString else v.asText())
      case _: BooleanType => Some(v.asBoolean().toString)
      case _: DateType => Some(v.asText()) // ISO date, identical encoding
      case _ => None // string (truncation), timestamp/ntz (ms rounding)
    }
    val stats = schema.fields.flatMap { f =>
      // a mapped log keys its stats by PHYSICAL name; graft by logical
      val key = physicalOf.getOrElse(f.name, f.name)
      val nc = nullsNode.get(key).filter(_.isNumber).map(_.asLong())
      val mn = mins.get(key).filter(v => !v.isNull && !v.isContainerNode)
        .flatMap(v => exact(f.dataType, v))
      val mx = maxs.get(key).filter(v => !v.isNull && !v.isContainerNode)
        .flatMap(v => exact(f.dataType, v))
      // a half-bound would trip exactBounds' refusal for the whole table;
      // import bounds only in (min, max) pairs
      val (bmn, bmx) = (mn, mx) match {
        case (Some(a), Some(b)) => (a, b)
        case _ => (null, null)
      }
      nc.map(c => f.name -> ColStats(bmn, bmx, c))
    }.toMap
    (numRecords, stats)
  }
}
