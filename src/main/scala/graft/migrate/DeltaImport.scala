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
  *  - LIVE deletion vectors: masked rows live in DV sidecar bitmaps this
  *    engine does not parse (Delta's z85/roaring container format).
  *    Purge on the Delta side (`REORG … APPLY (PURGE)`) and re-import.
  *    A table whose dv FEATURE is enabled but whose live adds carry no
  *    vector imports fine.
  *  - Column mapping `id`/`name` modes: physical parquet columns differ
  *    from logical names → refuse (mode `none` or absent imports).
  *  - Reader features beyond what this engine honors (`v2Checkpoint`
  *    sidecar checkpoints, unknown future features) → refuse loudly,
  *    exactly like the engine's own forward-compat gate.
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
    Set("timestampNtz", "columnMapping", "deletionVectors")

  /** Table property recording the highest Delta version the import/sync
    * has consumed. */
  val SourceVersionKey = "graft.delta.sourceVersion"

  /** Graft operations that cannot change the live data-file set. Anything
    * else between the last CONVERT/DELTA SYNC and now means graft-side
    * writes diverged from the Delta source — a Delta remove of a path graft
    * already rewrote would be dropped by the live-set filter while the
    * Delta-side replacement add still lands, silently duplicating rows —
    * so [[sync]] refuses: local DML is the cut-over moment. */
  private val FileSetNeutralOps = Set(
    "CONVERT", "DELTA SYNC", "VACUUM", "ANALYZE", "GENERATE",
    "SET TBLPROPERTIES", "UNSET TBLPROPERTIES", "UPGRADE PROTOCOL",
    "ADD FEATURE")

  def isDeltaTable(dir: String): Boolean =
    Files.isDirectory(Paths.get(dir, "_delta_log"))

  /** Incremental catch-up after [[convert]]: apply the Delta commits that
    * landed in `_delta_log` SINCE the last consumed version as ONE graft
    * commit (net adds/removes across the range — a file added and removed
    * within it never materializes), advancing [[SourceVersionKey]] in the
    * same commit so the operation is atomic and a re-run is a no-op. The
    * continuous-migration shape: convert once, sync on a cadence, cut over
    * when ready. Per-commit cost is O(new JSON lines) driver work.
    *
    * Same honesty gates as the import, plus: a mid-stream `metaData`
    * whose schema differs from the table's refuses (schema evolution is
    * the cut-over moment, not a silent sync step), and a gap in the JSON
    * chain (the Delta side checkpointed and cleaned past us) refuses with
    * a pointer to re-import. Returns the new graft version (the current
    * one when there was nothing to sync). */
  def sync(spark: SparkSession, dir: String): Long = {
    val t = LakeTable.forPath(spark, dir)
    val root = Paths.get(dir)
    val logDir = root.resolve("_delta_log")
    val from = t.properties.get(SourceVersionKey).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"$dir was not imported from Delta (no $SourceVersionKey property)"))
    // divergence guard: graft-side commits since the last sync point must
    // not have touched the live file set (see [[FileSetNeutralOps]])
    locally {
      val commits = t.snapshot().commits
      val syncPoint = commits.filter(c =>
          c.operation == "CONVERT" || c.operation == "DELTA SYNC")
        .map(_.version).maxOption.getOrElse(-1L)
      val diverging = commits.filter(_.version > syncPoint)
        .filterNot(c => FileSetNeutralOps(c.operation))
      require(diverging.isEmpty,
        s"graft-side commit(s) ${diverging.map(c =>
          s"v${c.version} ${c.operation}").mkString(", ")} changed the " +
          "table since the last Delta sync — local writes are the " +
          "cut-over moment; this table can no longer mirror the Delta " +
          "source (re-import into a fresh directory to keep syncing)")
    }
    val entries = {
      val s = Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }
    val jsonRe = raw"(\d{20})\.json".r
    val newer = entries.collect { case jsonRe(v) => v.toLong }
      .filter(_ > from).sorted
    // "nothing newer" is only "up to date" when the CHECKPOINT agrees: a
    // source that checkpointed past `from` and cleaned the JSON tail has
    // advanced invisibly, and reporting freshness would be silently stale
    val checkpointVersion: Option[Long] = scala.util.Try {
      mapper.readTree(new String(Files.readAllBytes(
        logDir.resolve("_last_checkpoint")), StandardCharsets.UTF_8))
        .get("version").asLong()
    }.toOption
    if (newer.isEmpty) {
      require(checkpointVersion.forall(_ <= from),
        s"Delta source checkpointed at version ${checkpointVersion.get} and " +
          s"cleaned the JSON tail past consumed $from — re-import")
      return t.version
    }
    require(newer.head == from + 1 &&
      newer.zip(newer.tail).forall { case (a, b) => b == a + 1 },
      s"Delta log advanced past the retained JSON tail (have $newer after " +
        s"consumed $from) — the source checkpointed and cleaned; re-import")

    val schema = t.snapshot().schema
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
    newer.foreach { v =>
      val lines = new String(Files.readAllBytes(
        logDir.resolve(f"$v%020d.json")), StandardCharsets.UTF_8)
        .split("\n").filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("metaData")) {
          val m = n.get("metaData")
          val incoming = DataType.fromJson(
            m.get("schemaString").asText()).asInstanceOf[StructType]
          require(incoming == schema,
            s"Delta commit $v changes the table schema — schema evolution " +
              "is a cut-over moment, not a silent sync step; re-import")
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
          // the DV flag nets like everything else: a mask written at v and
          // purged at v+k inside the range never blocks the sync — only a
          // LIVE mask at the end of the replay refuses (convert's rule)
          state.update(decodePath(a.get("path").asText()),
            Some(AddInfo(a.get("size").asLong(),
              a.get("modificationTime").asLong(),
              Option(a.get("stats")).filterNot(_.isNull).map(_.asText()),
              a.hasNonNull("deletionVector"), Map.empty))): Unit
        }
        if (n.has("remove"))
          state.update(decodePath(n.get("remove").get("path").asText()), None): Unit
      }
    }
    val adds = state.toSeq.collect { case (p, Some(info)) => p -> info }
    val removes = state.collect { case (p, None) => p }.toSeq
    require(!adds.exists(_._2.dv),
      s"the synced range leaves LIVE deletion vectors; purge them on the " +
        "Delta side (REORG TABLE … APPLY (PURGE)) and sync again")
    val now = System.currentTimeMillis()
    val graftAdds: Seq[graft.log.Action] = toAddFiles(spark, root, adds, schema)
    try {
      t.commitWithRetry("DELTA SYNC",
        Map("fromVersion" -> from.toString, "toVersion" -> newer.max.toString),
        t.snapshot(),
        Map("numAddedFiles" -> graftAdds.size.toLong,
          "numRemovedFiles" -> removes.size.toLong)) { s =>
        // a racing sync already consumed past `from`: stand down, no-op
        if (s.metadata.properties.get(SourceVersionKey).exists(_.toLong > from))
          throw new LakeTable.EpochAlreadyCommitted
        val live = s.files.map(_.path).toSet
        val meta = s.metadata.copy(properties =
          s.metadata.properties ++
            LakeTable.normalizeProps(syncedConf.getOrElse(Map.empty)) +
            (SourceVersionKey -> newer.max.toString))
        // property-implies-feature, exactly as setProperties stamps it: a
        // synced delta.enableChangeDataFeed / enableDeletionVectors / …
        // lands with its table feature in the same commit
        val proto = graft.log.Protocol.merge(s.protocol,
          LakeTable.impliedFeatures(meta.properties))
        (if (proto == s.protocol) Seq(meta) else Seq(proto, meta)) ++
          graftAdds ++
          removes.toSeq.filter(live.contains)
            .map(p => graft.log.RemoveFile(p, now))
      }
    } catch { case _: LakeTable.EpochAlreadyCommitted => () }
    t.version
  }

  /** One live add's replayed attributes. */
  private case class AddInfo(size: Long, mtime: Long, statsJson: Option[String],
      dv: Boolean, partitionValues: Map[String, String])

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

    val schema = DataType.fromJson(st.schemaString).asInstanceOf[StructType]
    val now = System.currentTimeMillis()
    val graftAdds: Seq[AddFile] = toAddFiles(spark, root, st.adds.toSeq, schema)

    // ---- one graft commit materializing the live snapshot ----
    val meta = graft.log.Metadata(st.tableId, root.getFileName.toString,
      schema.json, Nil,
      // delta.* table properties carry over under the engine's own
      // delta-prefix normalization (appendOnly, retention windows, …);
      // the consumed source version rides as a property so [[sync]] can
      // pick up exactly where the import stopped
      LakeTable.normalizeProps(st.configuration) +
        (SourceVersionKey -> st.sourceVersion.toString), now)
    val ci = CommitInfo(0L, now, "CONVERT",
      Map("numFiles" -> graftAdds.size.toString,
        "sourceFormat" -> "delta",
        "sourceVersion" -> st.sourceVersion.toString), Map.empty, -1L,
      LakeTable.currentUser, false, java.util.UUID.randomUUID().toString)
    // property-implies-feature invariant: an imported
    // delta.enableChangeDataFeed / enableDeletionVectors / … must stamp
    // its table feature in the same commit, exactly as setProperties does
    val proto = graft.log.Protocol.merge(graft.log.Protocol.Current,
      LakeTable.impliedFeatures(meta.properties))
    val tlog = new TxLog(root)
    if (!tlog.tryCommit(0L, ci +: proto +: meta +: graftAdds))
      return LakeTable.forPath(spark, dir) // lost a concurrent import: theirs won
    LakeTable.forPath(spark, dir)
  }

  /** Rewrite-import of a PARTITIONED Delta table into a NEW graft table at
    * `destDir`: partition values live only in the Delta log (and directory
    * names), never in the data files, so a zero-copy import cannot work —
    * instead ONE scan reads every live file, a BROADCAST join attaches each
    * file's partition tuple from the log (`_metadata.file_path` keyed — no
    * shuffle of the data, no per-partition scan fan-out), values cast to
    * the schema's declared types, and the result writes as a native graft
    * table partitioned by the same columns. O(data) once — the migration
    * rewrite the in-place refusal points at. The same honesty gates apply
    * (DVs, column mapping, reader features). */
  def convertRewrite(spark: SparkSession, srcDir: String, destDir: String): LakeTable = {
    // absolutized + normalized: the join key below must match the path
    // strings Spark reports for the planned files, and a relative or
    // non-normalized srcDir would build keys NOTHING matches
    val root = Paths.get(srcDir).toAbsolutePath.normalize
    val st = replay(spark, root)
    require(st.partitionColumns.nonEmpty,
      s"$srcDir is unpartitioned — use the zero-copy convert instead")
    gate(srcDir, st)
    val schema = DataType.fromJson(st.schemaString).asInstanceOf[StructType]
    val pcols = st.partitionColumns
    val props = LakeTable.normalizeProps(st.configuration)
    // a fully deleted (or never-written) partitioned source imports as an
    // empty partitioned graft table — schema and layout are fully known
    if (st.adds.isEmpty)
      return LakeTable.create(spark, destDir, schema,
        partitionColumns = pcols, properties = props, ifNotExists = false)
    val dataFields = schema.fields.filterNot(f =>
      pcols.exists(_.equalsIgnoreCase(f.name)))
    val livePaths = st.adds.keysIterator
      .map(p => root.resolve(p).toString).toSeq
    import org.apache.spark.sql.functions.{col, broadcast}
    // file -> partition tuple (log-authoritative, layout-independent)
    val pvSchema = StructType(
      StructField("__file", StringType) +:
        pcols.map(c => StructField(s"__pv_$c", StringType)))
    val pvRows: java.util.List[org.apache.spark.sql.Row] =
      st.adds.toSeq.map { case (p, info) =>
        org.apache.spark.sql.Row.fromSeq(
          root.resolve(p).toString +:
            pcols.map(c => info.partitionValues.getOrElse(c, null)))
      }.asJava
    val pv = spark.createDataFrame(pvRows, pvSchema)
    val raw = spark.read.schema(StructType(dataFields))
      .parquet(livePaths: _*)
      .withColumn("__file",
        graft.log.DvBitmap.stripPathCol(col("_metadata.file_path")))
    // loud pre-write guard (driver-only, no Spark job): every file the
    // scan plans must have a log tuple and vice versa — an inner join
    // silently dropping unmatched rows here would be total data loss,
    // the exact mis-read this module's gates exist to prevent
    val planned = raw.inputFiles.map(Stats.stripScheme).toSet
    val logged = st.adds.keysIterator
      .map(p => Stats.stripScheme(root.resolve(p).toString)).toSet
    require(planned == logged,
      s"planned scan files diverge from the Delta log's live set " +
        s"(only-planned: ${(planned -- logged).take(3)}, " +
        s"only-logged: ${(logged -- planned).take(3)}) — refusing to " +
        "write a silently incomplete import")
    val typed = raw.join(broadcast(pv), "__file")
      .select(schema.fields.map { f =>
        if (pcols.exists(_.equalsIgnoreCase(f.name)))
          col(s"__pv_${f.name}").cast(f.dataType).as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)
    // createFrom uses ifNotExists = false: a retried migration fails
    // LOUDLY on the existing destination instead of silently appending
    // the whole dataset a second time
    LakeTable.createFrom(spark, destDir, typed,
      partitionColumns = pcols, properties = props)
  }

  /** Shared honesty gates over a replayed state (everything except the
    * partitioning decision, which differs between the two imports). */
  private def gate(dir: String, st: ReplayedState): Unit = {
    val mappingMode = st.configuration.getOrElse("delta.columnMapping.mode", "none")
    require(mappingMode == "none",
      s"$dir uses column mapping mode '$mappingMode' (physical parquet " +
        "columns differ from logical names) — this importer does not " +
        "translate physical schemas")
    require(!st.adds.valuesIterator.exists(_.dv),
      s"$dir has LIVE deletion vectors; purge them on the Delta side " +
        "(REORG TABLE … APPLY (PURGE)) and re-import")
    val unknown = st.readerFeatures -- SupportedReaderFeatures
    require(st.minReader <= 3 && unknown.isEmpty,
      s"$dir requires Delta reader version ${st.minReader} with feature(s) " +
        s"${unknown.toSeq.sorted.mkString(", ")} this importer does not honor")
  }

  /** Live adds -> graft AddFiles with exact-only stats + footer fallback. */
  private def toAddFiles(spark: SparkSession, root: Path,
      adds: Seq[(String, AddInfo)],
      schema: StructType): Seq[AddFile] = {
    val statless = adds.collect {
      case (p, i) if i.statsJson.isEmpty => root.resolve(p) }.toSeq
    val footerStats: Map[String, (Long, Map[String, ColStats])] =
      if (statless.isEmpty) Map.empty else Stats.fromFooters(statless, schema)
    adds.toSeq.map { case (path, info) =>
      val (numRecords, colStats) = info.statsJson.map(parseDeltaStats(_, schema))
        .filter(_._1 >= 0)
        .getOrElse(footerStats.get(root.resolve(path).toString)
          .getOrElse((spark.read.parquet(root.resolve(path).toString).count(),
            Map.empty[String, ColStats])))
      AddFile(path = path, partitionValues = Map.empty, size = info.size,
        numRecords = numRecords, stats = colStats,
        modificationTime = info.mtime)
    }
  }

  /** Replay `<root>`'s Delta log (checkpoint base + JSON tail) into the
    * live table state. */
  private def replay(spark: SparkSession, root: Path): ReplayedState = {
    val logDir = root.resolve("_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $root")

    // ---- log layout: checkpoint base + JSON tail ----
    val entries = {
      val s = Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }
    val jsonRe = raw"(\d{20})\.json".r
    val jsonVersions = entries.collect { case jsonRe(v) => v.toLong }.sorted
    val lastCheckpoint: Option[(Long, Int)] =
      scala.util.Try {
        val n = mapper.readTree(new String(Files.readAllBytes(
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
        stats: Option[String], dv: Boolean, pv: Map[String, String]): Unit =
      adds.update(decodePath(path), AddInfo(size, mtime, stats, dv, pv)): Unit
    def applyRemove(path: String): Unit = adds.remove(decodePath(path)): Unit
    def applyMeta(id: String, schema: String, pcols: Seq[String],
        conf: Map[String, String]): Unit = {
      tableId = id; schemaString = schema
      partitionColumns = pcols; configuration = conf
    }

    // checkpoint base (classic parquet, single or multi-part): a Spark
    // read over metadata — the one distributed step, O(checkpoint rows)
    lastCheckpoint.foreach { case (v, parts) =>
      val names =
        if (parts <= 1) Seq(f"$v%020d.checkpoint.parquet")
        else (1 to parts).map(i => f"$v%020d.checkpoint.$i%010d.$parts%010d.parquet")
      val paths = names.map(logDir.resolve)
      require(paths.forall(Files.exists(_)),
        s"_last_checkpoint names version $v ($parts part(s)) but the " +
          "checkpoint parquet is missing — cannot reconstruct state")
      val cp = spark.read.parquet(paths.map(_.toString): _*)
      val cols = cp.columns.toSet
      require(!cols.contains("sidecar"),
        s"$root uses a v2 (sidecar) checkpoint this importer does not read")
      import org.apache.spark.sql.functions.col
      // ONE pass over the checkpoint parquet — per-action selects would
      // rescan the (potentially multi-million-row) metadata file per kind
      val want = Seq("metaData", "protocol", "add").filter(cols.contains)
      cp.select(want.map(col): _*).collect().foreach { r =>
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
              val hasDv = a.schema.fieldNames.contains("deletionVector")
              applyAdd(a.getAs[String]("path"), a.getAs[Long]("size"),
                a.getAs[Long]("modificationTime"),
                if (hasStats) Option(a.getAs[String]("stats")) else None,
                hasDv && a.getAs[AnyRef]("deletionVector") != null,
                Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
                  .map(_.toMap).getOrElse(Map.empty))
          }
        }
      }
      // checkpoint removes are expired-tombstone bookkeeping — the live
      // add set is complete without them
    }

    // JSON tail, in order
    tail.foreach { v =>
      val lines = new String(Files.readAllBytes(
        logDir.resolve(f"$v%020d.json")), StandardCharsets.UTF_8)
        .split("\n").filter(_.trim.nonEmpty)
      lines.foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("metaData")) {
          val m = n.get("metaData")
          applyMeta(m.get("id").asText(), m.get("schemaString").asText(),
            Option(m.get("partitionColumns")).map(_.elements().asScala
              .map(_.asText()).toSeq).getOrElse(Nil),
            Option(m.get("configuration")).map(c => c.properties().asScala
              .map(e => e.getKey -> e.getValue.asText()).toMap)
              .getOrElse(Map.empty))
        }
        if (n.has("protocol")) {
          val p = n.get("protocol")
          minReader = p.get("minReaderVersion").asInt()
          readerFeatures = Option(p.get("readerFeatures"))
            .map(_.elements().asScala.map(_.asText()).toSet)
            .getOrElse(Set.empty)
        }
        if (n.has("add")) {
          val a = n.get("add")
          applyAdd(a.get("path").asText(), a.get("size").asLong(),
            a.get("modificationTime").asLong(),
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText()),
            a.hasNonNull("deletionVector"),
            Option(a.get("partitionValues")).map(pvn =>
              pvn.properties().asScala.map(e => e.getKey ->
                (if (e.getValue.isNull) null else e.getValue.asText())).toMap)
              .getOrElse(Map.empty))
        }
        if (n.has("remove")) applyRemove(n.get("remove").get("path").asText())
      }
    }
    require(schemaString != null, s"no metaData action found under $logDir")
    ReplayedState(tableId, schemaString, configuration, partitionColumns,
      minReader, readerFeatures, sourceVersion, adds)
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
      statsJson: String, schema: StructType): (Long, Map[String, ColStats]) = {
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
      val nc = nullsNode.get(f.name).filter(_.isNumber).map(_.asLong())
      val mn = mins.get(f.name).filter(v => !v.isNull && !v.isContainerNode)
        .flatMap(v => exact(f.dataType, v))
      val mx = maxs.get(f.name).filter(v => !v.isNull && !v.isContainerNode)
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
