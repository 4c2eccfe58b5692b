package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.log.Pruner

class MaintainSpec extends SparkSpec {
  import spark.implicits._

  test("optimize compacts many small files into few; data identical (M8)") {
    val t = LakeTable.create(spark, tmpDir("opt").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType))))
    (0 until 8).foreach { i =>
      t.append(Seq.tabulate(100)(j => (i * 100L + j, j * 1.0)).toDF("id", "v").coalesce(1))
    }
    val before = t.snapshot()
    before.numFiles shouldBe 8
    val checksum = t.read().agg(sum("id"), sum("v")).head()
    t.optimizeCompact()
    val after = t.snapshot()
    after.numFiles should be < before.numFiles
    t.read().count() shouldBe 800
    t.read().agg(sum("id"), sum("v")).head() shouldBe checksum
    // time travel still sees the old layout
    t.versionAsOf(before.version).count() shouldBe 800
  }

  test("OPTIMIZE ZORDER is incremental: second pass rewrites only new files") {
    val t = LakeTable.create(spark, tmpDir("incz").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("k", LongType))))
    (0 until 4).foreach { i =>
      t.append(Seq.tabulate(250)(j => (i * 250L + j, (j * 7L) % 1000)).toDF("id", "k")
        .coalesce(1))
    }
    t.optimizeZOrder(Seq("k"), targetFileSize = 4096)
    val afterFirst = t.snapshot()
    afterFirst.files.foreach(_.tag("clusteredBy") shouldBe Some("zorder:k"))
    val clusteredPaths = afterFirst.files.map(_.path).toSet

    // new unclustered appends land next to the clustered set
    (0 until 2).foreach { i =>
      t.append(Seq.tabulate(250)(j => (2000L + i * 250 + j, (j * 11L) % 1000))
        .toDF("id", "k").coalesce(1))
    }
    val v = t.optimizeZOrder(Seq("k"), targetFileSize = 4096)
    val afterSecond = t.snapshot()
    // the first pass's outputs survived untouched — only the 2 new files
    // were rewritten (liquid clustering's incremental property)
    clusteredPaths.subsetOf(afterSecond.files.map(_.path).toSet) shouldBe true
    val ci = afterSecond.commits.find(_.version == v).get
    ci.operationMetrics("numFilesRemoved") shouldBe 2L
    ci.operationMetrics("numFilesSkippedAlreadyClustered") shouldBe
      clusteredPaths.size.toLong
    afterSecond.files.foreach(_.tag("clusteredBy") shouldBe Some("zorder:k"))
    t.read().count() shouldBe 1500

    // a DIFFERENT column set does not match the tag: full rewrite again
    t.optimizeZOrder(Seq("id"), targetFileSize = 1024 * 1024)
    val afterOther = t.snapshot()
    afterOther.files.foreach(_.tag("clusteredBy") shouldBe Some("zorder:id"))
    (afterOther.files.map(_.path).toSet intersect
      afterSecond.files.map(_.path).toSet) shouldBe empty
    // and full = true forces the global rewrite even when tags match
    val before = t.snapshot().files.map(_.path).toSet
    t.optimizeZOrder(Seq("id"), targetFileSize = 1024 * 1024, full = true)
    (t.snapshot().files.map(_.path).toSet intersect before) shouldBe empty
    t.read().count() shouldBe 1500
  }

  test("incremental-OPTIMIZE fuzz: random interleavings keep data identical, never re-cluster") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val t = LakeTable.create(spark, tmpDir(s"incfuzz$trial").resolve("t").toString,
        StructType(Seq(StructField("id", LongType), StructField("k", LongType))))
      var model = Vector.empty[(Long, Long)]
      var nextId = 0L
      (1 to 8).foreach { _ =>
        if (rnd.nextInt(3) < 2) {
          val n = 50 + rnd.nextInt(150)
          val rows = Vector.tabulate(n)(i => (nextId + i, rnd.nextInt(1000).toLong))
          nextId += n
          model ++= rows
          t.append(rows.toDF("id", "k").coalesce(1 + rnd.nextInt(2)))
        } else {
          val beforeTagged = t.snapshot().files
            .filter(_.tag("clusteredBy").contains("zorder:k")).map(_.path).toSet
          t.optimizeZOrder(Seq("k"), targetFileSize = 4096)
          val after = t.snapshot()
          // already-clustered outputs are never rewritten...
          beforeTagged.subsetOf(after.files.map(_.path).toSet) shouldBe true
          // ...and everything live is clustered after the pass
          after.files.foreach(_.tag("clusteredBy") shouldBe Some("zorder:k"))
        }
      }
      t.read().as[(Long, Long)].collect().sorted shouldBe model.sorted
    }
  }

  test("uniform_iceberg export runs entirely through the LogStore seam: an " +
    "InMemoryLogStore-backed table exports with ZERO local-FS metadata IO, " +
    "incremental reuse and DV position-deletes included") {
    val prev = graft.log.LogStore.default
    val mem = new graft.log.InMemoryLogStore
    graft.log.LogStore.default = mem
    try {
      val dir = tmpDir("uniform-mem").resolve("t")
      val t = LakeTable.createFrom(spark, dir.toString,
        spark.range(0, 100).select(col("id"),
          (col("id") % 7).cast("double").as("v")),
        properties = Map("graft.enableDeletionVectors" -> "true"))
      t.delete(col("id") % 10 === 0L) // masks ride DVs -> delete-file export
      t.generateIcebergMetadata()
      // nothing of the metadata touched the local filesystem
      java.nio.file.Files.exists(dir.resolve("metadata")) shouldBe false
      mem.size should be > 0
      // the store-aware hand-walk sees the full view: live set + deletes
      val (meta, files) = Uniform.readExport(t.dir, mem)
      Uniform.validateExport(t.dir, mem) shouldBe empty
      val live = t.snapshot().files.map(f => t.dir.resolve(f.path).toString).toSet
      files.filter(_("content") == 0)
        .map(_("file_path").asInstanceOf[String]).toSet shouldBe live
      files.count(_("content") == 1) shouldBe 1 // the position-delete file
      meta("format-version") shouldBe 2
      // incremental second export reuses manifests through the store too
      t.append(spark.range(100, 120).select(col("id"),
        (col("id") % 7).cast("double").as("v")))
      t.generateIcebergMetadata()
      val (_, files2) = Uniform.readExport(t.dir, mem)
      files2.filter(_("content") == 0)
        .map(_("file_path").asInstanceOf[String]).toSet shouldBe
        t.snapshot().files.map(f => t.dir.resolve(f.path).toString).toSet
    } finally graft.log.LogStore.default = prev
  }

  test("uniform_iceberg export: an independent hand-walk (hint -> metadata " +
    "JSON -> Avro manifest list -> Avro manifest) sees exactly the live " +
    "file set across churn; DVs refuse") {
    val t = LakeTable.create(spark, tmpDir("uniform").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("p", StringType))),
      partitionColumns = Seq("p"))
    (0 until 3).foreach { i =>
      t.append(spark.range(i * 100, (i + 1) * 100)
        .select(col("id"), concat(lit("p"), col("id") % 2).as("p")))
    }
    t.optimizeCompact() // tombstones files — the export must skip them
    val metaPath = t.generateIcebergMetadata()
    java.nio.file.Files.exists(metaPath) shouldBe true
    def liveSet() = t.snapshot().files
      .map(f => t.dir.resolve(f.path).toString).toSet
    val (meta1, files1) = Uniform.readExport(t.dir)
    Uniform.validateExport(t.dir) shouldBe empty // spec-invariant audit
    files1.map(_("file_path").asInstanceOf[String]).toSet shouldBe liveSet()
    // counts and formats ride each data_file record
    files1.map(_("record_count").asInstanceOf[Long]).sum shouldBe 300L
    files1.foreach(_("file_format") shouldBe "PARQUET")
    // typed identity-partition tuples: every record's p is p0 or p1
    val parts = files1.map(_("partition")
      .asInstanceOf[org.apache.avro.generic.GenericRecord].get("p").toString)
    parts.toSet shouldBe Set("p0", "p1")
    meta1("format-version") shouldBe 2
    // per-column bounds ride each data_file (Iceberg single-value binary:
    // little-endian long for id = field-id 1) — decoded over all files they
    // must bracket exactly the table's real min/max, so Iceberg readers
    // can file-skip off the same footer stats this engine prunes with
    def idBounds(rec: Map[String, Any], which: String): Long = {
      import scala.jdk.CollectionConverters._
      val arr = rec(which)
        .asInstanceOf[java.util.List[org.apache.avro.generic.GenericRecord]].asScala
      val bb = arr.find(_.get("key") == 1).get.get("value")
        .asInstanceOf[java.nio.ByteBuffer].duplicate()
      bb.order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    }
    files1.map(idBounds(_, "lower_bounds")).min shouldBe 0L
    files1.map(idBounds(_, "upper_bounds")).max shouldBe 299L
    // churn: delete + re-export — the NEW current snapshot sees the new set
    t.delete(col("id") < 50)
    t.generateIcebergMetadata()
    val (_, files2) = Uniform.readExport(t.dir)
    files2.map(_("file_path").asInstanceOf[String]).toSet shouldBe liveSet()
    files2.map(_("record_count").asInstanceOf[Long]).sum shouldBe
      t.read().count()
    // the export rides DESCRIBE HISTORY as a metadata-only commit
    val h = t.history(Some(1)).collect()(0)
    h.getString(3) shouldBe "GENERATE"
    h.getMap[String, String](4)("mode") shouldBe "uniform_iceberg"
    // SQL surface
    val viaSql = GraftSql(spark)
      .run(s"GENERATE uniform_iceberg FOR TABLE '${t.dir}'").collect()
    viaSql.length shouldBe 1
    // retention: keep the newest K metadata versions; Avro objects no
    // surviving metadata references GC past the grace window (backdated
    // here), in-flight-aged ones survive (the racing-export guard)
    t.setProperties(Map("graft.uniform.metadataRetention" -> "2"))
    val metaDir = t.dir.resolve("metadata")
    def metaNames() = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(metaDir)
      try s.iterator().asScala.map(_.getFileName.toString).toList finally s.close()
    }
    val ancient = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * Uniform.exportSweepGraceMs)
    // a racing export's in-flight object: unreferenced but FRESH — the
    // grace window must protect it at every sweep
    val inflight = metaDir.resolve("racing-inflight.avro")
    java.nio.file.Files.write(inflight, Array[Byte](1, 2, 3))
    (1 to 3).foreach { _ =>
      metaNames().filter(n => n.endsWith(".avro") && n != inflight.getFileName.toString)
        .foreach(n =>
          java.nio.file.Files.setLastModifiedTime(metaDir.resolve(n), ancient))
      t.generateIcebergMetadata()
    }
    val names = metaNames()
    names.count(_.matches(raw"v\d+\.metadata\.json")) shouldBe 2
    // the hand-walk still resolves through the retained metadata, and every
    // object it touches survived the sweep
    val (_, files3) = Uniform.readExport(t.dir)
    files3.map(_("file_path").asInstanceOf[String]).toSet shouldBe liveSet()
    // with retention 2, each metadata lists its snapshot plus one prior
    // (Iceberg time travel across exports), so the two survivors reference
    // THREE manifest lists; the no-churn exports all SHARE one data
    // manifest (incremental reuse); plus the protected in-flight orphan
    names.count(_.endsWith(".avro")) shouldBe 5
    java.nio.file.Files.exists(inflight) shouldBe true
    // once old, the unreferenced orphan is reclaimed by the next export
    java.nio.file.Files.setLastModifiedTime(inflight, ancient)
    t.generateIcebergMetadata()
    java.nio.file.Files.exists(inflight) shouldBe false
    // live deletion vectors export as a position-delete file: a reader
    // applying (file_path, pos) deletes over the exported data files must
    // see exactly the engine's masked rowset
    t.setProperties(Map("graft.enableDeletionVectors" -> "true"))
    t.delete(col("id") >= 60L && col("id") < 70L)
    t.snapshot().dvs should not be empty // masked, not rewritten
    t.generateIcebergMetadata()
    val (_, entries) = Uniform.readExport(t.dir)
    val dataFiles = entries.filter(_("content") == 0)
    val delFiles = entries.filter(_("content") == 1)
    dataFiles.map(_("file_path").asInstanceOf[String]).toSet shouldBe liveSet()
    delFiles should have size 1
    Uniform.validateExport(t.dir) shouldBe empty // audit holds under DVs too
    val delPath = delFiles.head("file_path").asInstanceOf[String]
    delPath should include("/metadata/")
    val del = spark.read.parquet(delPath)
    del.columns.toSeq shouldBe Seq("file_path", "pos")
    del.count() shouldBe delFiles.head("record_count")
    // the Iceberg spec requires position deletes sorted by (file_path, pos)
    val delRows = del.collect().map(r => (r.getString(0), r.getLong(1)))
    delRows.toSeq shouldBe delRows.toSeq.sorted
    // independent apply: data-file rows minus the delete positions == the
    // engine's masked read
    val withPos = spark.read
      .parquet(dataFiles.map(_("file_path").asInstanceOf[String]): _*)
      .select(col("id"),
        graft.log.DvBitmap.stripPathCol(col("_metadata.file_path")).as("__f"),
        col("_metadata.row_index").as("__i"))
    val applied = withPos.join(del,
        withPos("__f") === del("file_path") && withPos("__i") === del("pos"),
        "left_anti")
      .select("id").as[Long].collect().sorted
    applied shouldBe t.read().select("id").as[Long].collect().sorted
  }

  test("uniform_iceberg incremental export: unchanged manifests are reused " +
    "verbatim, appends write O(batch) manifests, removals drop only the " +
    "dirty manifest") {
    val t = LakeTable.create(spark, tmpDir("uniform-inc").resolve("t").toString,
      StructType(Seq(StructField("id", LongType))),
      // tiny manifest chunks force multiple manifests, so churn can dirty
      // SOME of them and reuse stays observable
      properties = Map("graft.uniform.manifestMaxEntries" -> "2"))
    (0 until 4).foreach(i =>
      t.append(spark.range(i * 10, i * 10 + 10).toDF("id").coalesce(1)))
    t.generateIcebergMetadata()
    def listRows() = Uniform.currentManifestList(t.dir.resolve("metadata"))
      .filter(_.get("content").asInstanceOf[Int] == 0)
      .map(m => m.get("manifest_path").toString)
    val first = listRows()
    first.size shouldBe 2 // 4 files / 2-entry chunks
    // pure append: every prior manifest reused VERBATIM, exactly one new
    t.append(spark.range(100, 110).toDF("id").coalesce(1))
    t.generateIcebergMetadata()
    val second = listRows()
    first.foreach(second should contain(_))
    second.size shouldBe 3
    val (_, files2) = Uniform.readExport(t.dir)
    files2.map(_("file_path").asInstanceOf[String]).toSet shouldBe
      t.snapshot().files.map(f => t.dir.resolve(f.path).toString).toSet
    val postAppendLiveSet =
      t.snapshot().files.map(f => t.dir.resolve(f.path).toString).toSet
    // no-churn export: write amplification is exactly one manifest list +
    // one metadata JSON — zero new manifests, zero rewritten objects
    def metaObjects() = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(t.dir.resolve("metadata"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith("version-hint")).toSet
      finally s.close()
    }
    val before = metaObjects()
    t.generateIcebergMetadata()
    val added = metaObjects() -- before
    added.count(_.startsWith("snap-")) shouldBe 1
    added.count(_.endsWith(".metadata.json")) shouldBe 1
    added.size shouldBe 2
    listRows().toSet shouldBe second.toSet // same manifests, reused

    // removal: only manifests that LOST a file drop; untouched ones persist
    t.delete(col("id") === 0L) // rewrites one file -> dirties its manifest
    t.read().filter(col("id") === 0L).count() shouldBe 0
    t.generateIcebergMetadata()
    val third = listRows()
    // at least one pre-existing manifest survives unchanged, and the live
    // set stays exact
    third.intersect(second) should not be empty
    val (_, files3) = Uniform.readExport(t.dir)
    files3.map(_("file_path").asInstanceOf[String]).toSet shouldBe
      t.snapshot().files.map(f => t.dir.resolve(f.path).toString).toSet
    // Iceberg time travel across exports: the current snapshot links to
    // its parent, and the PARENT's manifest list still resolves to the
    // file set AS OF the previous export (pre-delete)
    import scala.jdk.CollectionConverters._
    val meta = Uniform.priorMetadata(t.dir.resolve("metadata")).get
    val snaps = meta.get("snapshots")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
    val curId = meta.get("current-snapshot-id")
      .asInstanceOf[java.lang.Number].longValue()
    val cur = snaps.find(
      _.get("snapshot-id").asInstanceOf[java.lang.Number].longValue() == curId).get
    val parentId = cur.get("parent-snapshot-id")
      .asInstanceOf[java.lang.Number].longValue()
    val parent = snaps.find(
      _.get("snapshot-id").asInstanceOf[java.lang.Number].longValue() == parentId).get
    val parentFiles = {
      val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
        java.nio.file.Paths.get(parent.get("manifest-list").toString).toFile,
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      val manifests = try r.iterator().asScala
        .map(_.get("manifest_path").toString).toList finally r.close()
      manifests.flatMap(m =>
        Uniform.manifestDataPaths(java.nio.file.Paths.get(m))).toSet
    }
    parentFiles shouldBe postAppendLiveSet // the pre-delete live set
  }

  test("uniform_iceberg export under column mapping: RENAME keeps the " +
    "Iceberg field id stable, so by-id readers keep resolving old files") {
    val dir = tmpDir("uniform-cm").resolve("t").toString
    // column mapping (parquet field ids) is on from create for every table
    val t = LakeTable.create(spark, dir,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
    t.append(spark.range(10).select(col("id"), concat(lit("x"), col("id")).as("v")))
    t.generateIcebergMetadata()
    def schemaFields(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val metaDir = t.dir.resolve("metadata")
      val hint = new String(java.nio.file.Files.readAllBytes(
        metaDir.resolve("version-hint.text"))).trim
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readValue(
        java.nio.file.Files.readAllBytes(metaDir.resolve(s"v$hint.metadata.json")),
        classOf[java.util.Map[String, Object]])
      val curId = m.get("current-schema-id").asInstanceOf[java.lang.Number].longValue()
      m.get("schemas").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
        .asScala
        .find(_.get("schema-id").asInstanceOf[java.lang.Number].longValue() == curId)
        .get.get("fields")
        .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
        .map(f => f.get("name").toString ->
          f.get("id").asInstanceOf[java.lang.Number].longValue()).toMap
    }
    val before = schemaFields()
    before.keySet shouldBe Set("id", "v")
    t.renameColumn("v", "val")
    t.generateIcebergMetadata()
    val after = schemaFields()
    after.keySet shouldBe Set("id", "val")
    // the renamed column keeps its PARQUET field id — an Iceberg by-id
    // reader resolves pre-rename files under the new name, like this engine
    after("val") shouldBe before("v")
    after("id") shouldBe before("id")
    // and the hand-walk still sees the live set
    val (_, files) = Uniform.readExport(t.dir)
    files.map(_("file_path").asInstanceOf[String]).toSet shouldBe
      t.snapshot().files.map(f => t.dir.resolve(f.path).toString).toSet
    // schema HISTORY: the rename produced a second schema under a fresh
    // schema-id; the retained pre-rename snapshot keeps referencing the
    // OLD one, so time travel reads old files under the old shape
    import scala.jdk.CollectionConverters._
    val meta = Uniform.priorMetadata(t.dir.resolve("metadata")).get
    val schemas = meta.get("schemas")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
    schemas.size shouldBe 2
    val curSchemaId = meta.get("current-schema-id")
      .asInstanceOf[java.lang.Number].longValue()
    val snapsList = meta.get("snapshots")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
    val snapSchemaIds = snapsList
      .map(_.get("schema-id").asInstanceOf[java.lang.Number].longValue())
    snapSchemaIds.last shouldBe curSchemaId
    snapSchemaIds.head should not be curSchemaId
    Uniform.validateExport(t.dir) shouldBe empty
  }

  test("UniForm auto-export: enabledFormats=iceberg refreshes the Iceberg " +
    "view on every commit, with no extra history commits") {
    val t = LakeTable.create(spark, tmpDir("uniform-auto").resolve("t").toString,
      StructType(Seq(StructField("id", LongType))),
      // the Delta spelling — prefix normalization maps it to graft.*
      properties = Map("delta.universalFormat.enabledFormats" -> "iceberg"))
    def liveSet() = t.snapshot().files
      .map(f => t.dir.resolve(f.path).toString).toSet
    def exported() = Uniform.readExport(t.dir)._2
      .filter(_("content") == 0).map(_("file_path").asInstanceOf[String]).toSet
    t.append(spark.range(20).toDF("id"))
    exported() shouldBe liveSet() // the append itself refreshed the view
    t.delete(col("id") < 5)
    exported() shouldBe liveSet() // and so did the DML rewrite
    // auto mode writes no GENERATE history commits — the data commits ARE
    // the history; a MANUAL generate still records one
    import scala.jdk.CollectionConverters._
    t.history().collect().map(_.getString(3)) should not contain "GENERATE"
    t.generateIcebergMetadata()
    t.history(Some(1)).collect()(0).getString(3) shouldBe "GENERATE"
    // the manual export above ran at the SAME table version as the last
    // auto-export: retained snapshots must still carry strictly increasing
    // sequence numbers (Iceberg v2's ordering contract)
    val meta = Uniform.priorMetadata(t.dir.resolve("metadata")).get
    val seqs = meta.get("snapshots")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
      .map(_.get("sequence-number").asInstanceOf[java.lang.Number].longValue())
    seqs.toSeq shouldBe seqs.toSeq.sorted
    seqs.toSet should have size seqs.size.toLong.toInt
    // metadata-log carries the superseded-metadata lineage: every listed
    // file exists (retention-trimmed in step with expireExports) and the
    // newest entry names the file the current one replaced
    val mlog = meta.get("metadata-log")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
    mlog should not be empty
    mlog.foreach { e =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(
        e.get("metadata-file").toString)) shouldBe true
    }
    val hint = new String(java.nio.file.Files.readAllBytes(
      t.dir.resolve("metadata").resolve("version-hint.text"))).trim.toLong
    mlog.last.get("metadata-file").toString should endWith(s"v${hint - 1}.metadata.json")
    Uniform.validateExport(t.dir) shouldBe empty
  }

  test("UniForm DV export SHARDS the delete parquet above " +
    "deleteFileMaxPositions (driver copy bounded per shard); each shard " +
    "is sorted, counts sum exactly, and the import round-trips them") {
    val t = LakeTable.create(spark,
      tmpDir("uniform-dvshard").resolve("t").toString,
      StructType(Seq(StructField("id", LongType))),
      properties = Map(
        "graft.enableDeletionVectors" -> "true",
        "graft.uniform.deleteFileMaxPositions" -> "3"))
    // 8 files x 10 rows; masking every 4th id = 20 positions over 8 files
    (0 until 8).foreach(k =>
      t.append(spark.range(k * 10L, k * 10L + 10).toDF("id").coalesce(1)))
    t.delete(col("id") % 4 === 0L)
    t.snapshot().dvs.values.map(_.numDeleted).sum shouldBe 20
    t.generateIcebergMetadata()
    val (_, entries) = Uniform.readExport(t.dir)
    val delFiles = entries.filter(_("content") == 1)
    // 20 positions / max 3 = 7 hash shards over 8 distinct paths — at
    // least two delete files (one file's positions never split)
    delFiles.size should be >= 2
    delFiles.map(_("record_count").asInstanceOf[Long]).sum shouldBe 20L
    delFiles.foreach { df =>
      val rows = spark.read.parquet(df("file_path").asInstanceOf[String])
        .collect().map(r => (r.getString(0), r.getLong(1)))
      rows.toSeq shouldBe rows.toSeq.sorted // per-shard spec ordering
    }
    Uniform.validateExport(t.dir) shouldBe empty
    // the importer applies MULTIPLE delete files: sever + re-import
    graft.log.TxLog.deleteRecursively(t.dir.resolve("_txlog"))
    val t2 = LakeTable.convert(spark, t.dir.toString)
    t2.read().agg(sum("id")).head().getLong(0) shouldBe
      (0L until 80L).filter(_ % 4 != 0).sum
  }

  test("UniForm DV-manifest reuse: unrelated commits after a DELETE do not " +
    "rewrite the position-delete parquet") {
    val t = LakeTable.create(spark, tmpDir("uniform-dvreuse").resolve("t").toString,
      StructType(Seq(StructField("id", LongType))),
      properties = Map(
        "delta.universalFormat.enabledFormats" -> "iceberg",
        "graft.enableDeletionVectors" -> "true"))
    t.append(spark.range(100).toDF("id"))
    t.delete(col("id") < 10) // DV mask -> delete parquet exported
    def deleteParquets() = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(t.dir.resolve("metadata"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("delete-")).toSet
      finally s.close()
    }
    val afterDelete = deleteParquets()
    afterDelete should have size 1
    // unrelated append: DV state unchanged -> the delete manifest is
    // reused verbatim, no new Spark job, no new delete parquet
    t.append(spark.range(100, 120).toDF("id"))
    deleteParquets() shouldBe afterDelete
    // the reused delete still applies in the exported view
    val (_, entries) = Uniform.readExport(t.dir)
    entries.filter(_("content") == 1) should have size 1
    Uniform.validateExport(t.dir) shouldBe empty
    // a SECOND delete changes the DV fingerprint -> fresh delete parquet
    t.delete(col("id") === 50L)
    deleteParquets().size should be >= 2 // old one GC's later (grace window)
  }

  test("UniForm spec history: a DV-free export after a DV-bearing one keeps " +
    "the delete spec listed, so retained snapshots still resolve") {
    import scala.jdk.CollectionConverters._
    // PARTITIONED table: deletes export under the extra empty spec 1, and
    // the regression is a later export dropping spec 1 from partition-specs
    // while a retained snapshot's delete manifest still names it
    val t = LakeTable.create(spark, tmpDir("uniform-spechist").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("p", StringType))),
      partitionColumns = Seq("p"),
      properties = Map(
        "delta.universalFormat.enabledFormats" -> "iceberg",
        "graft.enableDeletionVectors" -> "true"))
    t.append(spark.range(100).select(col("id"), concat(lit("p"), col("id") % 2).as("p")))
    t.delete(col("id") < 10) // DV mask -> exported under spec 1
    def specIds(): Set[Long] = Uniform.priorMetadata(t.dir.resolve("metadata")).get
      .get("partition-specs").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.map(_.get("spec-id").asInstanceOf[java.lang.Number].longValue()).toSet
    specIds() shouldBe Set(0L, 1L)
    // purge the masks: the NEXT export has no delete manifest of its own,
    // but the prior (retained) snapshot still references spec 1
    t.reorgPurge()
    t.snapshot().dvs shouldBe empty
    specIds() shouldBe Set(0L, 1L) // carried forward, not dropped
    val meta = Uniform.priorMetadata(t.dir.resolve("metadata")).get
    val retainedSpecIds = meta.get("snapshots")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
      .flatMap { s =>
        val list = java.nio.file.Paths.get(s.get("manifest-list").toString)
        val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
          list.toFile,
          new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
        try r.iterator().asScala.map(_.get("partition_spec_id").asInstanceOf[Int].toLong).toList
        finally r.close()
      }.toSet
    // every spec any retained snapshot references resolves in the metadata
    retainedSpecIds.subsetOf(specIds()) shouldBe true
    retainedSpecIds should contain(1L) // the retained DV snapshot is the point
    Uniform.validateExport(t.dir) shouldBe empty
  }

  test("UniForm delete-manifest reuse stands down when a masked file re-adds " +
    "through a new manifest (sequence-number visibility)") {
    // Iceberg applies a position delete only to data files whose data
    // sequence number <= the delete file's. If churn dirties the manifest
    // carrying a masked file (the mask itself unchanged), the file re-adds
    // at THIS export's sequence — reusing the old lower-sequence delete
    // manifest would resurrect its masked rows in the exported view.
    val t = LakeTable.create(spark, tmpDir("uniform-delseq").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("p", StringType))),
      partitionColumns = Seq("p"),
      properties = Map(
        "delta.universalFormat.enabledFormats" -> "iceberg",
        "graft.enableDeletionVectors" -> "true"))
    // two files (one per partition) listed by ONE export
    t.append(spark.range(100).select(col("id"), concat(lit("p"), col("id") % 2).as("p")))
    t.delete(col("p") === "p0" && col("id") < 10) // DV on the p0 file only
    // churn p1 WITHOUT touching p0's mask: same DV fingerprint, but the
    // shared manifest is dirtied and the masked p0 file re-adds
    t.overwriteWhere(col("p") === "p1",
      spark.range(200, 250).select((col("id") * 2 + 1).as("id"), lit("p1").as("p")))
    val (_, entries) = Uniform.readExport(t.dir)
    val dataSeqOfMasked = entries.filter(e => e("content") == 0 &&
      t.snapshot().dvs.values.map(d => t.dir.resolve(d.forFile).toString).toSet
        .contains(e("file_path").asInstanceOf[String]))
      .map(_("sequence_number").asInstanceOf[Long])
    dataSeqOfMasked should not be empty
    val deleteSeqs = entries.filter(_("content") == 1)
      .map(_("sequence_number").asInstanceOf[Long])
    deleteSeqs should not be empty
    // the delete file must be visible over every masked data file
    deleteSeqs.min should be >= dataSeqOfMasked.max
    // and the exported view still reads exactly like the engine
    Uniform.validateExport(t.dir) shouldBe empty
  }

  test("UniForm schema reuse is stable for NESTED schemas: re-exports neither " +
    "append duplicate schemas nor drift nested ids") {
    import scala.jdk.CollectionConverters._
    val t = LakeTable.create(spark, tmpDir("uniform-nested").resolve("t").toString,
      StructType(Seq(
        StructField("id", LongType),
        StructField("tags", ArrayType(LongType)))),
      properties = Map("delta.universalFormat.enabledFormats" -> "iceberg"))
    def meta() = Uniform.priorMetadata(t.dir.resolve("metadata")).get
    def schemas() = meta().get("schemas")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala.toSeq
    def lastCol() = meta().get("last-column-id").asInstanceOf[java.lang.Number].longValue()
    t.append(spark.range(10).select(col("id"), array(col("id")).as("tags")))
    val (s1, lc1) = (schemas(), lastCol())
    s1 should have size 1
    t.append(spark.range(10, 20).select(col("id"), array(col("id")).as("tags")))
    t.append(spark.range(20, 30).select(col("id"), array(col("id")).as("tags")))
    val (s2, lc2) = (schemas(), lastCol())
    // an UNCHANGED nested schema matches its own prior export: one schema
    // entry, byte-identical (nested element-id included), stable
    // last-column-id — no per-export drift
    s2 should have size 1
    s2.head shouldBe s1.head
    lc2 shouldBe lc1
    Uniform.validateExport(t.dir) shouldBe empty
  }

  test("UniForm exports timestamp_ntz bounds (now a stats type), decodable " +
    "as little-endian micros") {
    import scala.jdk.CollectionConverters._
    val t = LakeTable.create(spark, tmpDir("uniform-ntz").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("ts", TimestampNTZType))),
      properties = Map("delta.universalFormat.enabledFormats" -> "iceberg"))
    val lo = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    t.append(spark.range(5).select(col("id"),
      expr("to_timestamp_ntz(concat('2024-01-01 0', id, ':00:00'))").as("ts")))
    val (_, entries) = Uniform.readExport(t.dir)
    val tsId = 2 // ordinal ids on an unmapped table: id=1, ts=2
    val bounds = entries.filter(_("content") == 0).flatMap { e =>
      def of(field: String): Option[Long] =
        Option(e(field)).map(_.asInstanceOf[java.util.List[
          org.apache.avro.generic.GenericRecord]].asScala
          .find(_.get("key").asInstanceOf[Int] == tsId).map { kv =>
            kv.get("value").asInstanceOf[java.nio.ByteBuffer].duplicate()
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          }.get)
      for (l <- of("lower_bounds"); u <- of("upper_bounds")) yield (l, u)
    }
    bounds should not be empty
    val micros = (ldt: java.time.LocalDateTime) =>
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    bounds.map(_._1).min shouldBe micros(lo)
    bounds.map(_._2).max shouldBe micros(lo.plusHours(4))
    Uniform.validateExport(t.dir) shouldBe empty
  }

  test("symlink manifest lists exactly the snapshot's live files, per partition") {
    val t = LakeTable.create(spark, tmpDir("manifest").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("p", StringType))),
      partitionColumns = Seq("p"))
    (0 until 3).foreach { i =>
      t.append(spark.range(i * 100, (i + 1) * 100)
        .select(col("id"), concat(lit("p"), col("id") % 2).as("p")))
    }
    t.optimizeCompact() // tombstones some files — manifest must skip them
    val root = t.generateSymlinkManifest()
    def manifestUris(sub: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(root.resolve(sub).resolve("manifest"))
        .asScala.toSeq.filter(_.nonEmpty)
    }
    val listed = (manifestUris("p=p0") ++ manifestUris("p=p1"))
      .map(u => java.nio.file.Paths.get(java.net.URI.create(u)).toString).toSet
    val snap = t.snapshot()
    listed shouldBe snap.files.map(f => t.dir.resolve(f.path).toString).toSet
    // an external engine reading ONLY the manifest sees the exact table
    val external = spark.read.parquet(
      (manifestUris("p=p0") ++ manifestUris("p=p1")): _*)
    external.count() shouldBe 300
    // regeneration replaces wholesale after more churn
    t.delete(col("id") < 50)
    t.generateSymlinkManifest()
    (manifestUris("p=p0") ++ manifestUris("p=p1"))
      .map(u => java.nio.file.Paths.get(java.net.URI.create(u)).toString)
      .toSet shouldBe t.snapshot().files.map(f => t.dir.resolve(f.path).toString).toSet
    // the root is a symlink swapped atomically: a crash can leave a stale
    // manifest, never a missing one; regeneration keeps exactly ONE live
    // generation and sweeps leftovers from crashed prior runs
    java.nio.file.Files.isSymbolicLink(root) shouldBe true
    // crashed-run orphans (OLD mtimes) are reclaimed; a FRESH dir — a
    // racing GENERATE's in-flight staging — must survive the sweep
    val ancient = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2L * 60 * 60 * 1000)
    for (n <- Seq("staging-deadbeef", "old-deadbeef")) {
      val p = t.dir.resolve(s"_symlink_format_manifest.$n")
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.setLastModifiedTime(p, ancient)
    }
    java.nio.file.Files.createDirectories(
      t.dir.resolve("_symlink_format_manifest.gen-racing-fresh"))
    t.generateSymlinkManifest(): Unit
    locally {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(t.dir)
      val leftovers =
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("_symlink_format_manifest")).toSeq
        finally s.close()
      leftovers should not contain "_symlink_format_manifest.staging-deadbeef"
      leftovers should not contain "_symlink_format_manifest.old-deadbeef"
      leftovers should contain("_symlink_format_manifest.gen-racing-fresh")
      // root link + its one generation + the protected fresh dir
      leftovers.toSet.size shouldBe 3
    }
    graft.log.TxLog.deleteRecursively(
      t.dir.resolve("_symlink_format_manifest.gen-racing-fresh"))
    // live deletion vectors refuse (masks are invisible to manifest readers)
    t.setProperties(Map("graft.enableDeletionVectors" -> "true"))
    t.delete(col("id") === 60L)
    val e = intercept[IllegalArgumentException] { t.generateSymlinkManifest() }
    e.getMessage should include("REORG")
    // SQL surface
    t.reorgPurge()
    graft.table.GraftSql(spark)
      .run(s"GENERATE symlink_format_manifest FOR TABLE '${t.dir}'")
      .collect().head.getString(0) should include("_symlink_format_manifest")
  }

  test("clustered ingest writes carry the provenance tag; OPTIMIZE skips them") {
    val t = LakeTable.create(spark, tmpDir("inci").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("k", LongType))),
      properties = Map("graft.clusterBy" -> "k"))
    t.append(Seq.tabulate(500)(j => (j.toLong, (j * 13L) % 1000)).toDF("id", "k"))
    val ingested = t.snapshot()
    ingested.files.foreach(_.tag("clusteredBy") shouldBe Some("zorder:k"))
    val paths = ingested.files.map(_.path).toSet
    // OPTIMIZE ZORDER on the same column set: nothing to do
    val v0 = t.snapshot().version
    t.optimizeZOrder(Seq("k")) shouldBe v0
    t.snapshot().files.map(_.path).toSet shouldBe paths
  }

  test("optimizeWrite coalesces an over-partitioned append into few files") {
    val df = spark.range(1000).select(col("id"), (col("id") % 7).cast("double").as("v"))
    // without the property: one file per input partition
    val plain = LakeTable.create(spark, tmpDir("owoff").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType))))
    plain.append(df.repartition(16))
    plain.snapshot().numFiles shouldBe 16
    // with it: the pre-write shuffle lets AQE coalesce to the advisory size
    val ow = LakeTable.create(spark, tmpDir("owon").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("v", DoubleType))),
      properties = Map("graft.autoOptimize.optimizeWrite" -> "true"))
    ow.append(df.repartition(16))
    ow.snapshot().numFiles should be <= 2
    ow.read().agg(sum("id"), sum("v")).head() shouldBe
      plain.read().agg(sum("id"), sum("v")).head()
    // partitioned table: rebalance keys on the partition columns; file
    // count collapses to ~one per partition value instead of 16 per value
    val owp = LakeTable.create(spark, tmpDir("owp").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("p", StringType))),
      partitionColumns = Seq("p"),
      properties = Map("graft.autoOptimize.optimizeWrite" -> "true"))
    owp.append(spark.range(600)
      .select(col("id"), concat(lit("p"), col("id") % 3).as("p")).repartition(16))
    owp.snapshot().numFiles should be <= 4
    owp.read().count() shouldBe 600
  }

  test("autoCompact bin-packs small files once they pass the threshold") {
    val t = LakeTable.create(spark, tmpDir("ac").resolve("t").toString,
      StructType(Seq(StructField("id", LongType))),
      properties = Map(
        "graft.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "4"))
    (0 until 4).foreach { i =>
      t.append(Seq.tabulate(50)(j => i * 50L + j).toDF("id").coalesce(1))
    }
    // the 4th append crossed the threshold and triggered a compaction commit
    t.snapshot().numFiles shouldBe 1
    t.history(None).filter(col("operation") === "OPTIMIZE").count() shouldBe 1
    t.read().count() shouldBe 200
  }

  test("zorder clustering tightens per-file ranges so pruning skips files (M9)") {
    val t = LakeTable.create(spark, tmpDir("zord").resolve("t").toString,
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    // interleaved appends: every file spans the full range of a -> no skipping
    val n = 10000
    (0 until 4).foreach { i =>
      t.append(Seq.tabulate(n / 4)(j => ((j * 4 + i).toLong, ((j * 7919) % n).toLong))
        .toDF("a", "b").coalesce(1))
    }
    val before = t.snapshot()
    val prunedBefore = Pruner.prune(before.files, Seq(col("a") < 100), before.schema)
    prunedBefore.size shouldBe 4 // all files overlap [0,100)
    // small target size → ~16+ z-range files, so the top z bits split on
    // BOTH dimensions and a range predicate on `a` can skip most files
    t.optimizeZOrder(Seq("a", "b"), targetFileSize = 6 * 1024)
    val after = t.snapshot()
    after.numFiles should be > 8
    val prunedAfter = Pruner.prune(after.files, Seq(col("a") < 100), after.schema)
    prunedAfter.size.toDouble should be < after.numFiles * 0.6
    // identical data
    t.read().agg(sum("a"), sum("b")).head() shouldBe
      t.versionAsOf(before.version).agg(sum("a"), sum("b")).head()
    t.read().count() shouldBe n
  }

  test("z-order on a STRING column buckets by first differing byte, enabling skipping") {
    val t = LakeTable.create(spark, tmpDir("zstr").resolve("t").toString,
      StructType(Seq(StructField("k", StringType), StructField("v", LongType))))
    // shared prefix "user-" + spread letter: hash buckets would spray these,
    // prefix buckets keep lexicographic neighbors together
    val n = 4000
    (0 until 4).foreach { i =>
      t.append(Seq.tabulate(n / 4) { j =>
        val g = (j * 4 + i) % 26
        (f"user-${('a' + g).toChar}%c-${j}%05d", (j * 4 + i).toLong)
      }.toDF("k", "v").coalesce(1))
    }
    val before = t.snapshot()
    Pruner.prune(before.files, Seq(col("k") < "user-c"), before.schema)
      .size shouldBe 4 // every interleaved file spans the whole range
    t.optimizeZOrder(Seq("k"), targetFileSize = 8 * 1024)
    val after = t.snapshot()
    after.numFiles should be > 4
    val prunedAfter = Pruner.prune(after.files, Seq(col("k") < "user-c"), after.schema)
    prunedAfter.size.toDouble should be < after.numFiles * 0.5
    t.read().count() shouldBe n
    t.read().agg(sum("v")).head() shouldBe
      t.versionAsOf(before.version).agg(sum("v")).head()
  }

  test("partitioned optimize keeps partition structure") {
    val t = LakeTable.create(spark, tmpDir("optp").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("day", StringType))),
      partitionColumns = Seq("day"))
    (0 until 3).foreach { i =>
      t.append(Seq.tabulate(10)(j => ((i * 10 + j).toLong, s"d${j % 2}")).toDF("id", "day"))
    }
    t.optimizeCompact()
    t.read(Seq(col("day") === "d0")).count() shouldBe 15
    t.snapshot().files.forall(_.partitionValues.contains("day")) shouldBe true
  }

  test("OPTIMIZE WHERE compacts only the matching partitions") {
    val t = LakeTable.create(spark, tmpDir("optw").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("day", StringType))),
      partitionColumns = Seq("day"))
    (0 until 4).foreach { i =>
      t.append(Seq.tabulate(8)(j => ((i * 8 + j).toLong, s"d${j % 2}")).toDF("id", "day"))
    }
    def filesFor(day: String) =
      t.snapshot().files.filter(_.partitionValues.get("day").contains(day)).map(_.path).toSet
    val d1Before = filesFor("d1")
    t.optimizeCompact(where = Some(col("day") === "d0"))
    filesFor("d1") shouldBe d1Before            // untouched partition keeps its files
    filesFor("d0").size should be < 4           // scoped partition compacted
    t.read().count() shouldBe 32
  }

  test("UniForm sort-order + Puffin NDV statistics: declared clustering " +
    "exports as the default sort order, analyzeSketches' theta sketches " +
    "publish as a spec-decodable Puffin statistics file, and the " +
    "zero-copy import translates both back") {
    val t = LakeTable.create(spark,
      tmpDir("uniform-stats").resolve("t").toString,
      StructType(Seq(StructField("id", LongType),
        StructField("cat", StringType))),
      properties = Map("graft.clusterBy" -> "id"))
    t.append(spark.range(0, 1000).select(col("id"),
      concat(lit("c"), col("id") % 37).as("cat")))
    t.analyzeSketches()
    // ANALYZE recorded sketch-estimate stats + the sidecar pointer; theta
    // sketches are EXACT below their nominal entry count (4096), so the
    // estimates are the true NDVs
    val props = t.properties
    props("stats.numRows") shouldBe "1000"
    props("stats.id.distinctCount") shouldBe "1000"
    props("stats.cat.distinctCount") shouldBe "37"
    props.keySet should contain("graft.stats.thetaSidecar")
    t.generateIcebergMetadata()
    Uniform.validateExport(t.dir) shouldBe empty

    // ---- independent hand-walk of the exported metadata ----
    import scala.jdk.CollectionConverters._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = t.dir.resolve("metadata")
    val hint = new String(java.nio.file.Files.readAllBytes(
      metaDir.resolve("version-hint.text"))).trim
    val meta = m.readValue(java.nio.file.Files.readAllBytes(
      metaDir.resolve(s"v$hint.metadata.json")),
      classOf[java.util.Map[String, Object]])
    // sort order: default id 1, identity asc over the clustered column
    meta.get("default-sort-order-id")
      .asInstanceOf[Number].intValue() shouldBe 1
    val orders = meta.get("sort-orders")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
    orders.map(_.get("order-id").asInstanceOf[Number].intValue())
      .toSeq shouldBe Seq(0, 1)
    val sf = orders.find(_.get("order-id")
        .asInstanceOf[Number].intValue() == 1).get
      .get("fields")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
    sf.map(f => (f.get("transform").toString,
      f.get("source-id").asInstanceOf[Number].intValue(),
      f.get("direction").toString, f.get("null-order").toString))
      .toSeq shouldBe Seq(("identity", 1, "asc", "nulls-first"))
    // statistics entry bound to the CURRENT snapshot
    val curSnap = meta.get("current-snapshot-id")
      .asInstanceOf[Number].longValue()
    val stats = meta.get("statistics")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
    stats should have size 1
    val entry = stats.head
    entry.get("snapshot-id").asInstanceOf[Number].longValue() shouldBe curSnap
    val statsPath = java.nio.file.Paths.get(
      entry.get("statistics-path").toString)
    java.nio.file.Files.size(statsPath) shouldBe
      entry.get("file-size-in-bytes").asInstanceOf[Number].longValue()

    // ---- hand-decode the Puffin file to the PUBLIC spec, independently
    // of graft.table.Puffin: magic at both ends, little-endian footer
    // tail, JSON payload, then each theta blob via DataSketches directly
    val bytes = java.nio.file.Files.readAllBytes(statsPath)
    new String(bytes, 0, 4, "UTF-8") shouldBe "PFA1"
    new String(bytes, bytes.length - 4, 4, "UTF-8") shouldBe "PFA1"
    val bb = java.nio.ByteBuffer.wrap(bytes, bytes.length - 12, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val payloadSize = bb.getInt()
    bb.getInt() shouldBe 0 // flags: uncompressed
    val payloadStart = bytes.length - 12 - payloadSize
    new String(bytes, payloadStart - 4, 4, "UTF-8") shouldBe "PFA1"
    val payload = m.readValue(
      new String(bytes, payloadStart, payloadSize, "UTF-8"),
      classOf[java.util.Map[String, Object]])
    val blobs = payload.get("blobs")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
    blobs.map(_.get("type").toString).distinct.toSeq shouldBe
      Seq("apache-datasketches-theta-v1")
    val byField = blobs.map { b =>
      val off = b.get("offset").asInstanceOf[Number].intValue()
      val len = b.get("length").asInstanceOf[Number].intValue()
      val sk = org.apache.datasketches.theta.CompactSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(
          java.util.Arrays.copyOfRange(bytes, off, off + len)))
      (b.get("fields").asInstanceOf[java.util.List[Object]].asScala
        .map(_.asInstanceOf[Number].intValue()).toSeq,
        Math.round(sk.getEstimate),
        b.get("properties").asInstanceOf[java.util.Map[String, Object]]
          .get("ndv").toString.toLong)
    }
    byField.map(_._1).toSet shouldBe Set(Seq(1), Seq(2))
    byField.foreach { case (_, est, ndvProp) => est shouldBe ndvProp }
    byField.find(_._1 == Seq(1)).get._2 shouldBe 1000L
    byField.find(_._1 == Seq(2)).get._2 shouldBe 37L

    // ---- round-trip: the zero-copy import translates both back ----
    graft.log.TxLog.deleteRecursively(t.dir.resolve("_txlog"))
    val imported = LakeTable.convert(spark, t.dir.toString)
    imported.properties("graft.clusterBy") shouldBe "id"
    imported.properties("stats.id.distinctCount") shouldBe "1000"
    imported.properties("stats.cat.distinctCount") shouldBe "37"
    // the sketch BYTES carried too: a RE-export of the mirror publishes a
    // statistics entry again without a fresh analyzeSketches pass
    imported.properties.keySet should contain("graft.stats.thetaSidecar")
    imported.generateIcebergMetadata()
    val hint2 = new String(java.nio.file.Files.readAllBytes(
      metaDir.resolve("version-hint.text"))).trim
    val meta2 = m.readValue(java.nio.file.Files.readAllBytes(
      metaDir.resolve(s"v$hint2.metadata.json")),
      classOf[java.util.Map[String, Object]])
    val stats2 = meta2.get("statistics")
      .asInstanceOf[java.util.List[java.util.Map[String, Object]]].asScala
    stats2.map(_.get("snapshot-id").asInstanceOf[Number].longValue())
      .toSeq should contain(meta2.get("current-snapshot-id")
        .asInstanceOf[Number].longValue())
  }
}
