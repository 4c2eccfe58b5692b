package graft.migrate

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.log.{AddFile, ColStats, ColumnIds, CommitInfo, Stats, TxLog}
import graft.table.LakeTable

/** Zero-copy import of an Apache Iceberg table (HadoopTables layout —
  * `metadata/v<N>.metadata.json` + Avro manifest lists/manifests): the
  * remaining interop quadrant. [[graft.table.Uniform]] exports TO Iceberg;
  * this replays Iceberg metadata INTO a graft table in place, sharing every
  * data file — so an exported table round-trips, and a foreign Iceberg
  * table migrates without a rewrite.
  *
  * Replayed state (Iceberg table spec, format-version 2): the current
  * metadata file (version-hint.text, else the highest `v<N>.metadata.json`),
  * its current snapshot's manifest list, each DATA manifest's live entries
  * (status != DELETED), and each DELETE manifest's position-delete files —
  * which transcode into the engine's own deletion-vector masks (one Spark
  * read of (file_path, pos) rows, aggregated into per-file roaring bitmaps,
  * never a driver-side position explosion).
  *
  * Honest scope — refuse rather than silently mis-read:
  *  - format-version 2 only (v1 manifests carry a different entry shape);
  *  - identity partition transforms only (bucket/truncate/days values are
  *    DERIVED — the source column is intact in the data files, but graft
  *    models layout as identity columns; non-identity specs refuse);
  *    identity-partitioned Iceberg data files CONTAIN their partition
  *    columns, so the zero-copy import stays faithful (unlike Delta);
  *  - equality deletes refuse (row-predicate deletes cannot transcode to
  *    position masks without a scan);
  *  - data files outside the table root refuse, like the Delta importer's
  *    absolute-path rule;
  *  - column binding: when every live footer carries parquet field ids
  *    agreeing with the Iceberg schema ids, the import keeps by-id
  *    resolution (renames survive); otherwise it falls back to BY NAME and
  *    requires every footer column to be a schema column (Iceberg's own
  *    name-mapping fallback shape).
  *
  * Stats: record counts come from the manifests and are CROSS-CHECKED
  * against the parquet footers; min/max bounds are re-derived from footers
  * (exact by construction) rather than trusted from manifests — the
  * Iceberg spec allows truncated (loose) bounds, which are safe for
  * skipping but would poison graft's metadata-only EXACT min/max answers.
  * One parallel footer pass at import time buys exactness forever. */
object IcebergImport {

  private val plain = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Metadata IO rides [[graft.log.LogStore.default]] (the engine's store
    * seam); data/delete parquet and footer reads are data-plane Spark /
    * Hadoop-FS IO, object-store capable by construction. */
  private def store: graft.log.LogStore = graft.log.LogStore.default

  def isIcebergTable(dir: String): Boolean =
    store.listFileNames(Paths.get(dir, "metadata")).exists(n =>
      n == "version-hint.text" || n.matches(raw"v\d+\.metadata\.json"))

  /** Import `<dir>`'s Iceberg metadata as a graft table IN PLACE
    * (idempotent: an already-imported directory returns the existing graft
    * table). */
  def convert(spark: SparkSession, dir: String): LakeTable = {
    if (TxLog.isTable(dir)) return LakeTable.forPath(spark, dir)
    val root = Paths.get(dir).toAbsolutePath.normalize
    val metaDir = root.resolve("metadata")
    val (metaVersion, meta) = resolveMetadata(metaDir)
    val formatVersion = num(meta.get("format-version"))
    require(formatVersion == 2,
      s"$dir is an Iceberg format-version $formatVersion table — this " +
        "importer replays version 2 (v1 manifests have a different shape)")

    // ---- schema (current-schema-id) ----
    val schemaId = num(meta.get("current-schema-id"))
    val schemaNode = meta.get("schemas")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
      .find(s => num(s.get("schema-id")) == schemaId)
      .getOrElse(throw new IllegalArgumentException(
        s"current-schema-id $schemaId not present in schemas"))
    val schemaWithIds = structOf(schemaNode, topLevelIds = true)

    // ---- partition spec (default-spec-id; identity only) ----
    val specId = num(meta.get("default-spec-id"))
    val spec = meta.get("partition-specs")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
      .find(s => num(s.get("spec-id")) == specId)
      .getOrElse(throw new IllegalArgumentException(
        s"default-spec-id $specId not present in partition-specs"))
    val idToName = schemaWithIds.fields.map(f =>
      ColumnIds.idOf(f).get -> f.name).toMap
    // (spec FIELD name, source column name): the manifest partition
    // record's Avro fields are named by the SPEC field, which a foreign
    // writer may name differently from the source column
    val partFields: Seq[(String, String)] = spec.get("fields")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
      .map { f =>
        val transform = f.get("transform").toString
        require(transform == "identity",
          s"partition transform '$transform' is not identity — derived " +
            "partition values cannot import as layout columns")
        val column = idToName.getOrElse(num(f.get("source-id")),
          throw new IllegalArgumentException(
            s"partition source-id ${f.get("source-id")} is not a " +
              "top-level schema column"))
        f.get("name").toString -> column
      }.toSeq
    val pcols: Seq[String] = partFields.map(_._2)
    // graft's partition values are strings cast back to the column type;
    // only types with a faithful string round-trip from the Avro encoding
    // import (the same set the exporter writes)
    pcols.foreach { c =>
      val dt = schemaWithIds.fields.find(_.name == c).get.dataType
      require(dt match {
        case StringType | LongType | IntegerType | ShortType | ByteType |
             DateType => true
        case _ => false
      }, s"identity partition column '$c' has type $dt — its Avro " +
        "partition encoding has no faithful string form in this importer")
    }

    // ---- current snapshot -> manifests -> live files + deletes ----
    val currentSnap = Option(meta.get("current-snapshot-id"))
      .map(num).filter(_ != -1L)
    val (dataEntries, deletePaths) = currentSnap match {
      case None => (Nil, Nil)
      case Some(snapId) =>
        val snap = meta.get("snapshots")
          .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
          .find(s => num(s.get("snapshot-id")) == snapId)
          .getOrElse(throw new IllegalArgumentException(
            s"current-snapshot-id $snapId not present in snapshots"))
        val manifests = avroRecords(
          Paths.get(Stats.stripScheme(snap.get("manifest-list").toString)))
        val data = scala.collection.mutable.ListBuffer.empty[GenericRecord]
        val deletes = scala.collection.mutable.ListBuffer.empty[String]
        manifests.foreach { m =>
          val content = m.get("content").asInstanceOf[Int]
          avroRecords(Paths.get(
            Stats.stripScheme(m.get("manifest_path").toString))).foreach { e =>
            if (e.get("status").asInstanceOf[Int] != 2) { // 2 = DELETED
              val df = e.get("data_file").asInstanceOf[GenericRecord]
              val fileContent = df.get("content").asInstanceOf[Int]
              (content, fileContent) match {
                case (0, 0) => data += df
                case (1, 1) => deletes += df.get("file_path").toString
                case (1, 2) => throw new IllegalArgumentException(
                  s"$dir carries EQUALITY deletes — predicate deletes " +
                    "cannot transcode to position masks; compact them " +
                    "away on the Iceberg side and re-import")
                case other => throw new IllegalArgumentException(
                  s"manifest/file content mismatch $other in " +
                    s"${m.get("manifest_path")}")
              }
            }
          }
        }
        (data.toList, deletes.toList)
    }

    // ---- paths relativize against the root (refuse external) ----
    def relativize(p: String): String = {
      val abs = Paths.get(Stats.stripScheme(p)).toAbsolutePath.normalize
      require(abs.startsWith(root),
        s"Iceberg data file $p does not live under the table root $root " +
          "— cannot import in place")
      root.relativize(abs).toString
    }
    val live: Seq[(String, GenericRecord)] = dataEntries.map { df =>
      val fmt = df.get("file_format").toString
      require(fmt.equalsIgnoreCase("parquet"),
        s"data file format '$fmt' is not parquet — cannot import")
      relativize(df.get("file_path").toString) -> df
    }
    require(live.map(_._1).distinct.size == live.size,
      s"duplicate live data-file paths in $dir's manifests — malformed")

    // ---- column binding: by id when the footers prove it, else by name --
    // Iceberg field ids are never reused, so they are AUTHORITATIVE
    // regardless of footer names: a footer column whose id matches a live
    // schema id is that column (this is exactly how renames survive — old
    // files keep the old NAME but the id binds them to the renamed
    // column); an id outside the live set is a dropped column, unread.
    // By-id is therefore safe precisely when EVERY footer column carries
    // an id. Id-less files fall back to BY NAME, where every footer name
    // must be a schema column (Iceberg's name-mapping fallback shape).
    val icebergIds: Map[String, Long] = schemaWithIds.fields.map(f =>
      f.name -> ColumnIds.idOf(f).get).toMap
    // ONE footer pass serves both the binding decision and the stats
    // re-derivation (2N opens would double import metadata IO for nothing)
    val footers: Map[String, (Long, Map[String, ColStats], Seq[(String, Option[Int])])] =
      if (live.isEmpty) Map.empty
      else Stats.fromFootersWithIds(
        live.map(p => root.resolve(p._1)), schemaWithIds)
    val allIdsPresent = live.nonEmpty && live.forall { case (p, _) =>
      footers(root.resolve(p).toString)._3.forall(_._2.isDefined)
    }
    val schema =
      if (allIdsPresent) schemaWithIds
      else {
        live.foreach { case (p, _) =>
          footers(root.resolve(p).toString)._3.foreach { case (name, _) =>
            require(icebergIds.contains(name),
              s"file $p column '$name' is not a schema column and the " +
                "files carry no usable field ids — name-mapping this " +
                "importer cannot resolve; rewrite the table")
          }
        }
        ColumnIds.strip(schemaWithIds)
      }
    val now = System.currentTimeMillis()
    // identity partition tuples carry into graft's string-encoded
    // partitionValues (pruning/replaceWhere run off them); dates decode
    // from the avro epoch-day int back to the ISO string graft casts
    val graftAdds: Seq[AddFile] = live.map { case (p, df) =>
      val abs = root.resolve(p).toString
      val (footerCount, colStats, _) = footers(abs)
      val manifestCount = df.get("record_count").asInstanceOf[Long]
      require(manifestCount == footerCount,
        s"manifest says $manifestCount records for $p, the footer says " +
          s"$footerCount — refusing inconsistent metadata")
      val pv: Map[String, String] =
        if (pcols.isEmpty) Map.empty
        else {
          val part = df.get("partition").asInstanceOf[GenericRecord]
          partFields.map { case (fieldName, c) =>
            val v = part.get(fieldName) // keyed by the SPEC field name
            val dt = schemaWithIds.fields.find(_.name == c).get.dataType
            c -> (if (v == null) null else dt match {
              case DateType => java.time.LocalDate
                .ofEpochDay(v.asInstanceOf[java.lang.Number].longValue()).toString
              case _ => v.toString
            })
          }.toMap
        }
      AddFile(path = p, partitionValues = pv, size =
        df.get("file_size_in_bytes").asInstanceOf[Long],
        numRecords = manifestCount, stats = colStats,
        modificationTime = now)
    }

    // ---- position deletes -> graft deletion-vector masks ----
    val dvActions: Seq[graft.log.Action] =
      if (deletePaths.isEmpty) Nil
      else {
        val rel = s"dv/import-${java.util.UUID.randomUUID().toString.replace("-", "").take(12)}"
        import org.apache.spark.sql.functions.col
        val liveAbs = graftAdds.map(f => root.resolve(f.path).toString).toSet
        // file_path values may be scheme-ful URIs (foreign writers):
        // canonicalize exactly like the data-file paths above. DANGLING
        // delete rows — targets compacted away without a delete rewrite, a
        // spec-valid state Iceberg readers ignore — drop here too, BEFORE
        // the mask aggregate, so they never become phantom graft vectors.
        val liveDf = {
          import spark.implicits._
          liveAbs.toSeq.toDF("__path")
        }
        val masks = spark.read
          .parquet(deletePaths.map(p => Stats.stripScheme(p)): _*)
          .select(graft.log.DvBitmap.stripPathCol(
            col("file_path").cast(StringType)).as("__path"), col("pos"))
          .join(org.apache.spark.sql.functions.broadcast(liveDf),
            Seq("__path"), "left_semi") // drops dangling rows, scalably
          .groupBy("__path")
          .agg(graft.log.DvBitmap.aggPositions(col("pos")).as("__bitmap"))
        masks.withColumn("__n", graft.log.DvBitmap.cardinality(col("__bitmap")))
          .write.mode("errorifexists").parquet(root.resolve(rel).toString)
        // per-file mask counts (one tiny row per masked file)
        val counts = spark.read.parquet(root.resolve(rel).toString)
          .select("__path", "__n").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        graftAdds.flatMap(f => counts.get(root.resolve(f.path).toString)
          .map(n => graft.log.DeletionVector(f.path, rel, n)))
      }

    // ---- one graft commit materializing the snapshot ----
    val properties = Option(meta.get("properties"))
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala
        .map { case (k, v) => k -> String.valueOf(v) }.toMap)
      .getOrElse(Map.empty[String, String])
    val maxIdProp: Map[String, String] =
      if (!allIdsPresent) Map.empty
      else Map(ColumnIds.MaxIdKey -> math.max(
        Option(meta.get("last-column-id")).map(num).getOrElse(0L),
        ColumnIds.maxId(Map.empty, schema)).toString)
    val metaAction = graft.log.Metadata(
      Option(meta.get("table-uuid")).map(_.toString)
        .getOrElse(java.util.UUID.randomUUID().toString),
      root.getFileName.toString, schema.json, pcols,
      LakeTable.normalizeProps(properties) ++ maxIdProp, now)
    val ci = CommitInfo(0L, now, "CONVERT",
      Map("numFiles" -> graftAdds.size.toString,
        "sourceFormat" -> "iceberg",
        "numDeletionVectors" -> dvActions.size.toString,
        "sourceVersion" -> metaVersion.toString), Map.empty, -1L,
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

  // ------------------------------------------------------------ helpers

  private def num(o: Object): Long = o.asInstanceOf[java.lang.Number].longValue()

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
