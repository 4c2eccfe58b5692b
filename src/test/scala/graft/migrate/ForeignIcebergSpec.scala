package graft.migrate

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable

/** Importing FOREIGN Iceberg metadata — fixtures hand-crafted to the public
  * Iceberg v2 spec with avro schemas authored here, independent of the
  * engine's own exporter, exercising the shapes a round-trip through
  * [[graft.table.Uniform]] can never produce: partition spec FIELD names
  * that differ from the source column, scheme-ful `file:` URIs throughout,
  * and partition source types the importer must refuse. */
class ForeignIcebergSpec extends SparkSpec {
  import spark.implicits._

  private val jackson = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }
  private def json(v: Any): String = jackson.writeValueAsString(v)

  private def writeAvro(target: Path, schema: org.apache.avro.Schema,
      rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, target.toFile)
    try rows.foreach(w.append) finally w.close()
  }

  /** Minimal spec-shaped manifest-list row schema (the importer reads by
    * field name; a real foreign writer has more fields, which named access
    * tolerates). */
  private val listSchema = new org.apache.avro.Schema.Parser().parse("""{
    "type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"manifest_length","type":"long"},
      {"name":"partition_spec_id","type":"int"},
      {"name":"content","type":"int"},
      {"name":"sequence_number","type":"long"},
      {"name":"min_sequence_number","type":"long"},
      {"name":"added_snapshot_id","type":"long"}]}""")

  /** Manifest entry schema whose partition record field is named by the
    * SPEC FIELD ("cat_part"), not the source column ("cat") — the foreign
    * shape the importer must read correctly. */
  private val entrySchema = new org.apache.avro.Schema.Parser().parse("""{
    "type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":{
        "type":"record","name":"r2","fields":[
          {"name":"content","type":"int"},
          {"name":"file_path","type":"string"},
          {"name":"file_format","type":"string"},
          {"name":"partition","type":{
            "type":"record","name":"r102","fields":[
              {"name":"cat_part","type":["null","string"],"default":null}]}},
          {"name":"record_count","type":"long"},
          {"name":"file_size_in_bytes","type":"long"}]}}]}""")

  private def entry(df: (Int, String, String, Long, Long),
      partValue: String): GenericRecord = {
    val (content, path, fmt, count, size) = df
    val part = new GenericData.Record(
      entrySchema.getField("data_file").schema().getField("partition").schema())
    part.put("cat_part", partValue)
    val d = new GenericData.Record(entrySchema.getField("data_file").schema())
    d.put("content", content)
    d.put("file_path", path)
    d.put("file_format", fmt)
    d.put("partition", part)
    d.put("record_count", count)
    d.put("file_size_in_bytes", size)
    val e = new GenericData.Record(entrySchema)
    e.put("status", 1)
    e.put("data_file", d)
    e
  }

  private def schemaJson(catType: String) = Map(
    "type" -> "struct", "schema-id" -> 0,
    "fields" -> Seq(
      Map("id" -> 1, "name" -> "id", "required" -> false, "type" -> "long"),
      Map("id" -> 2, "name" -> "cat", "required" -> false, "type" -> catType)))

  private def metadataJson(dir: Path, listPath: Path, snapId: Long,
      catType: String = "string", seq: Long = 1L): String = json(Map(
    "format-version" -> 2,
    "table-uuid" -> java.util.UUID.randomUUID().toString,
    "location" -> dir.toString,
    "last-sequence-number" -> seq,
    "last-updated-ms" -> 1700000000000L,
    "last-column-id" -> 2,
    "current-schema-id" -> 0,
    "schemas" -> Seq(schemaJson(catType)),
    "default-spec-id" -> 0,
    // the spec FIELD is named cat_part; its source is column 'cat' (id 2)
    "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Seq(Map(
      "name" -> "cat_part", "transform" -> "identity",
      "source-id" -> 2, "field-id" -> 1000)))),
    "last-partition-id" -> 1000,
    "default-sort-order-id" -> 0,
    "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
    "properties" -> Map.empty,
    "current-snapshot-id" -> snapId,
    "snapshots" -> Seq(Map(
      "snapshot-id" -> snapId, "timestamp-ms" -> 1700000000000L,
      "sequence-number" -> seq, "schema-id" -> 0,
      "summary" -> Map("operation" -> "append"),
      "manifest-list" -> s"file:$listPath")),
    "snapshot-log" -> Nil, "metadata-log" -> Nil))

  private def listRowOf(path: Path, content: Int): GenericRecord = {
    val r = new GenericData.Record(listSchema)
    r.put("manifest_path", s"file:$path")
    r.put("manifest_length", Files.size(path))
    r.put("partition_spec_id", 0)
    r.put("content", content)
    r.put("sequence_number", 1L)
    r.put("min_sequence_number", 1L)
    r.put("added_snapshot_id", 42L)
    r
  }

  /** Publish metadata version `v` whose current snapshot lists exactly
    * `manifests` — one foreign writer commit. */
  private def publish(dir: Path, v: Long, snapId: Long, seq: Long,
      manifests: Seq[(Path, Int)]): Unit = {
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val listPath = metaDir.resolve(s"snap-$snapId.avro")
    writeAvro(listPath, listSchema,
      manifests.map { case (p, c) => listRowOf(p, c) })
    Files.write(metaDir.resolve(s"v$v.metadata.json"),
      metadataJson(dir, listPath, snapId, seq = seq)
        .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      v.toString.getBytes(StandardCharsets.UTF_8)): Unit
  }

  /** One parquet data file (id long, cat string) with field ids stamped. */
  private def dataFile(dir: Path, name: String, rows: Seq[(Long, String)]): Path = {
    def fid(id: Long) = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    val df = rows.toDF("id", "cat")
      .select(col("id").as("id", fid(1)), col("cat").as("cat", fid(2)))
    val staging = Files.createTempDirectory("foreign-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.resolve("out").toString)
    val part = {
      val s = Files.list(staging.resolve("out"))
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.createDirectories(dir)
    Files.move(part, dir.resolve(name))
    graft.log.TxLog.deleteRecursively(staging)
    dir.resolve(name)
  }

  test("foreign layout: spec field name differs from the source column, " +
    "every path a file: URI, position deletes included — partition values " +
    "bind to the COLUMN, pruning works, masks apply") {
    val dir = tmpDir("foreign-iceberg").resolve("t")
    val fa = dataFile(dir, "data-a.parquet", Seq((1L, "a"), (2L, "a"), (3L, "a")))
    val fb = dataFile(dir, "data-b.parquet", Seq((10L, "b"), (11L, "b")))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    // position-delete parquet masking position 1 of file A (id 2)
    val del = {
      val staging = Files.createTempDirectory("foreign-del")
      Seq((s"file:$fa", 1L)).toDF("file_path", "pos").coalesce(1)
        .write.mode("overwrite").parquet(staging.resolve("out").toString)
      val part = {
        val s = Files.list(staging.resolve("out"))
        try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close()
      }
      Files.move(part, metaDir.resolve("del-1.parquet"))
      graft.log.TxLog.deleteRecursively(staging)
      metaDir.resolve("del-1.parquet")
    }
    // manifests: one data (scheme-ful file_paths), one deletes
    val mData = metaDir.resolve("m-data.avro")
    writeAvro(mData, entrySchema, Seq(
      entry((0, s"file:$fa", "PARQUET", 3L, Files.size(fa)), "a"),
      entry((0, s"file:$fb", "parquet", 2L, Files.size(fb)), "b")))
    val mDel = metaDir.resolve("m-del.avro")
    writeAvro(mDel, entrySchema, Seq(
      entry((1, s"file:$del", "PARQUET", 1L, Files.size(del)), null)))
    val listPath = metaDir.resolve("snap-42.avro")
    def listRow(path: Path, content: Int): GenericRecord = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", s"file:$path")
      r.put("manifest_length", Files.size(path))
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("sequence_number", 1L)
      r.put("min_sequence_number", 1L)
      r.put("added_snapshot_id", 42L)
      r
    }
    writeAvro(listPath, listSchema, Seq(listRow(mData, 0), listRow(mDel, 1)))
    Files.write(metaDir.resolve("v1.metadata.json"),
      metadataJson(dir, listPath, 42L).getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))

    val t = LakeTable.convert(spark, dir.toString)
    t.snapshot().metadata.partitionColumns shouldBe Seq("cat")
    // partition tuples bound through the spec FIELD name to the column
    t.snapshot().files.map(f =>
      f.path -> f.partitionValues("cat")).toMap shouldBe
      Map("data-a.parquet" -> "a", "data-b.parquet" -> "b")
    // the position delete applied: id 2 masked
    t.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 3L, 10L, 11L)
    // partition pruning works off the imported tuples
    val full = t.snapshot().numFiles
    t.read(Seq(col("cat") === "b")).inputFiles.length should be < full
    // files carry field ids agreeing with the schema -> mapped import
    graft.log.ColumnIds.mapped(t.snapshot().schema) shouldBe true
  }

  test("sync follows a foreign writer: net add/remove, masks appear and " +
    "clear, replays no-op, local DML blocks, schema change refuses") {
    val dir = tmpDir("foreign-sync").resolve("t")
    val fa = dataFile(dir, "data-a.parquet", Seq((1L, "a"), (2L, "a"), (3L, "a")))
    val fb = dataFile(dir, "data-b.parquet", Seq((10L, "b"), (11L, "b")))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val mAB = metaDir.resolve("m-ab.avro")
    writeAvro(mAB, entrySchema, Seq(
      entry((0, s"file:$fa", "PARQUET", 3L, Files.size(fa)), "a"),
      entry((0, s"file:$fb", "PARQUET", 2L, Files.size(fb)), "b")))
    publish(dir, 1, 42L, 1L, Seq(mAB -> 0))
    val t = LakeTable.convert(spark, dir.toString)
    t.read().count() shouldBe 5
    t.properties(IcebergImport.SourceSeqKey) shouldBe "1"
    // v2: the source drops b, adds c, and masks position 0 of a (id 1)
    val fc = dataFile(dir, "data-c.parquet", Seq((20L, "c"), (21L, "c")))
    val del = {
      val staging = Files.createTempDirectory("foreign-sync-del")
      Seq((s"file:$fa", 0L)).toDF("file_path", "pos").coalesce(1)
        .write.mode("overwrite").parquet(staging.resolve("out").toString)
      val part = {
        val s = Files.list(staging.resolve("out"))
        try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close()
      }
      Files.move(part, metaDir.resolve("del-2.parquet"))
      graft.log.TxLog.deleteRecursively(staging)
      metaDir.resolve("del-2.parquet")
    }
    val mAC = metaDir.resolve("m-ac.avro")
    writeAvro(mAC, entrySchema, Seq(
      entry((0, s"file:$fa", "PARQUET", 3L, Files.size(fa)), "a"),
      entry((0, s"file:$fc", "PARQUET", 2L, Files.size(fc)), "c")))
    val mDel = metaDir.resolve("m-del2.avro")
    writeAvro(mDel, entrySchema, Seq(
      entry((1, s"file:$del", "PARQUET", 1L, Files.size(del)), null)))
    publish(dir, 2, 43L, 2L, Seq(mAC -> 0, mDel -> 1))
    IcebergImport.sync(spark, dir.toString)
    val t2 = LakeTable.forPath(spark, dir.toString)
    t2.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(2L, 3L, 20L, 21L)
    t2.snapshot().files.map(_.path).toSet shouldBe
      Set("data-a.parquet", "data-c.parquet")
    t2.snapshot().dvs.keySet shouldBe Set("data-a.parquet")
    t2.snapshot().files.find(_.path == "data-c.parquet").get
      .partitionValues("cat") shouldBe "c"
    // CDF follows the mirror (r13): the sync commit's net changes read as
    // insert/delete rows — including the newly-masked position as a delete
    val ch = t2.changes(t2.version, Some(t2.version))
    ch.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq shouldBe Seq(20L, 21L)
    ch.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 10L, 11L) // masked pos 0 of a + the removed file b
    // replay: no-op
    val v2 = t2.version
    IcebergImport.sync(spark, dir.toString) shouldBe v2
    // v3: the source purges the mask (no delete manifest anymore)
    publish(dir, 3, 44L, 3L, Seq(mAC -> 0))
    IcebergImport.sync(spark, dir.toString)
    val t3 = LakeTable.forPath(spark, dir.toString)
    t3.snapshot().dvs shouldBe empty
    t3.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 2L, 3L, 20L, 21L)
    // the purge reads as a resurrection insert in the change feed
    t3.changes(t3.version, Some(t3.version))
      .filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSeq shouldBe Seq(1L)
    // local DML = cut-over: a later sync refuses
    t3.delete(col("id") === 20L)
    publish(dir, 4, 45L, 4L, Seq(mAC -> 0))
    intercept[IllegalArgumentException] {
      IcebergImport.sync(spark, dir.toString)
    }.getMessage should include("cut-over")
  }

  test("sync FOLLOWS source-side renames of non-partition columns (by-id); " +
    "a type change and a partition-column rename refuse (cut-over)") {
    val dir = tmpDir("foreign-sync-schema").resolve("t")
    val fa = dataFile(dir, "data-a.parquet", Seq((1L, "a")))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val m = metaDir.resolve("m-a.avro")
    writeAvro(m, entrySchema,
      Seq(entry((0, s"file:$fa", "PARQUET", 1L, Files.size(fa)), "a")))
    publish(dir, 1, 42L, 1L, Seq(m -> 0))
    LakeTable.convert(spark, dir.toString)
    // v2 renames column 'id' -> 'ident' (same id 1, same manifests):
    // by-id binding makes this followable — the sync applies the rename
    val listPath = metaDir.resolve("snap-43.avro")
    writeAvro(listPath, listSchema, Seq(listRowOf(m, 0)))
    Files.write(metaDir.resolve("v2.metadata.json"),
      metadataJson(dir, listPath, 43L, seq = 2L)
        .replace("\"name\":\"id\"", "\"name\":\"ident\"")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "2".getBytes(StandardCharsets.UTF_8))
    IcebergImport.sync(spark, dir.toString)
    val t2 = LakeTable.forPath(spark, dir.toString)
    t2.snapshot().schema.fieldNames.toSeq shouldBe Seq("ident", "cat")
    t2.read().select("ident").as[Long].collect().toSeq shouldBe Seq(1L)
    t2.properties(IcebergImport.SourceSeqKey) shouldBe "2"
    // v3 changes the renamed column's TYPE: refuses as cut-over
    val listPath3 = metaDir.resolve("snap-44.avro")
    writeAvro(listPath3, listSchema, Seq(listRowOf(m, 0)))
    Files.write(metaDir.resolve("v3.metadata.json"),
      metadataJson(dir, listPath3, 44L, seq = 3L)
        .replace("\"name\":\"id\",\"required\":false,\"type\":\"long\"",
          "\"name\":\"id\",\"required\":false,\"type\":\"string\"")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "3".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] {
      IcebergImport.sync(spark, dir.toString)
    }.getMessage should include("cut-over")
    // v4 renames the PARTITION column instead: refuses (stale
    // partitionValues keys on existing files would break exact matching)
    val listPath4 = metaDir.resolve("snap-45.avro")
    writeAvro(listPath4, listSchema, Seq(listRowOf(m, 0)))
    Files.write(metaDir.resolve("v4.metadata.json"),
      metadataJson(dir, listPath4, 45L, seq = 4L)
        .replace("\"name\":\"cat\"", "\"name\":\"category\"")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "4".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] {
      IcebergImport.sync(spark, dir.toString)
    }.getMessage should include("partition spec")
  }

  test("sync FOLLOWS an added nullable column: old rows read null, a new " +
    "file carries values; a dropped column refuses") {
    val dir = tmpDir("foreign-sync-add").resolve("t")
    val fa = dataFile(dir, "data-a.parquet", Seq((1L, "a"), (2L, "a")))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    def meta3(v: Long, listPath: Path, snapId: Long, seq: Long,
        fields: Seq[Map[String, Any]]): String = json(Map(
      "format-version" -> 2,
      "table-uuid" -> "aaaaaaaa-bbbb-cccc-dddd-000000000001",
      "location" -> dir.toString,
      "last-sequence-number" -> seq, "last-updated-ms" -> 1700000000000L,
      "last-column-id" -> fields.map(_("id").asInstanceOf[Int]).max,
      "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
        "fields" -> fields)),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Nil)),
      "last-partition-id" -> 999, "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
      "properties" -> Map.empty, "current-snapshot-id" -> snapId,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> snapId, "timestamp-ms" -> 1700000000000L,
        "sequence-number" -> seq, "schema-id" -> 0,
        "summary" -> Map("operation" -> "append"),
        "manifest-list" -> s"file:$listPath")),
      "snapshot-log" -> Nil, "metadata-log" -> Nil))
    def fld(id: Int, name: String, t: String): Map[String, Any] =
      Map("id" -> id, "name" -> name, "required" -> false, "type" -> t)
    val m = metaDir.resolve("m-a.avro")
    writeAvro(m, entrySchema,
      Seq(entry((0, s"file:$fa", "PARQUET", 2L, Files.size(fa)), null)))
    val l1 = metaDir.resolve("snap-42.avro")
    writeAvro(l1, listSchema, Seq(listRowOf(m, 0)))
    Files.write(metaDir.resolve("v1.metadata.json"),
      meta3(1, l1, 42L, 1L, Seq(fld(1, "id", "long"), fld(2, "cat", "string")))
        .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))
    LakeTable.convert(spark, dir.toString)
    // v2 ADDS nullable 'note' (id 3) + a data file carrying all 3 columns
    val fb = {
      val df = Seq((10L, "b", "hello")).toDF("id", "cat", "note")
        .select(col("id").as("id", fid(1)), col("cat").as("cat", fid(2)),
          col("note").as("note", fid(3)))
      rawFile(dir, "data-b.parquet", df)
    }
    val mB = metaDir.resolve("m-b.avro")
    writeAvro(mB, entrySchema,
      Seq(entry((0, s"file:$fb", "PARQUET", 1L, Files.size(fb)), null)))
    val l2 = metaDir.resolve("snap-43.avro")
    writeAvro(l2, listSchema, Seq(listRowOf(m, 0), listRowOf(mB, 0)))
    Files.write(metaDir.resolve("v2.metadata.json"),
      meta3(2, l2, 43L, 2L, Seq(fld(1, "id", "long"), fld(2, "cat", "string"),
        fld(3, "note", "string"))).getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "2".getBytes(StandardCharsets.UTF_8))
    IcebergImport.sync(spark, dir.toString)
    val t2 = LakeTable.forPath(spark, dir.toString)
    t2.snapshot().schema.fieldNames.toSeq shouldBe Seq("id", "cat", "note")
    t2.read().orderBy("id").select("id", "note")
      .as[(Long, String)].collect().toSeq shouldBe
      Seq((1L, null), (2L, null), (10L, "hello"))
    // the id high-water mark rose with the added column
    t2.properties(graft.log.ColumnIds.MaxIdKey).toLong should be >= 3L
    // v3 DROPS 'cat': refuses as cut-over
    val l3 = metaDir.resolve("snap-44.avro")
    writeAvro(l3, listSchema, Seq(listRowOf(m, 0), listRowOf(mB, 0)))
    Files.write(metaDir.resolve("v3.metadata.json"),
      meta3(3, l3, 44L, 3L, Seq(fld(1, "id", "long"), fld(3, "note", "string")))
        .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "3".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] {
      IcebergImport.sync(spark, dir.toString)
    }.getMessage should include("dropped")
  }

  test("by-id import never attributes footer stats by a REUSED name: a " +
    "footer column named like a schema column but carrying a different " +
    "field id contributes no stats (its bytes are another column's)") {
    val dir = tmpDir("foreign-iceberg-statpoison").resolve("t")
    // spec-legal foreign shape: ids never reuse, names may. This old live
    // file stores column id 1 under its RETIRED name 'b'; the CURRENT
    // schema is a(id 1), b(id 2) — 'b' was renamed to 'a' and the name
    // 'b' reused for a new column (stored as 'bx' in this file).
    def fid(id: Long) = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    val f = {
      val df = Seq((100L, 0L), (101L, 1L), (104L, 4L)).toDF("va", "vb")
        .select(col("va").as("b", fid(1)), col("vb").as("bx", fid(2)))
      val staging = Files.createTempDirectory("foreign-poison-stage")
      df.coalesce(1).write.mode("overwrite").parquet(staging.resolve("out").toString)
      val part = {
        val s = Files.list(staging.resolve("out"))
        try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close()
      }
      Files.createDirectories(dir)
      Files.move(part, dir.resolve("data-old.parquet"))
      graft.log.TxLog.deleteRecursively(staging)
      dir.resolve("data-old.parquet")
    }
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val m = metaDir.resolve("m-old.avro")
    writeAvro(m, entrySchema,
      Seq(entry((0, s"file:$f", "PARQUET", 3L, Files.size(f)), null)))
    val listPath = metaDir.resolve("snap-42.avro")
    writeAvro(listPath, listSchema, Seq(listRowOf(m, 0)))
    Files.write(metaDir.resolve("v1.metadata.json"), json(Map(
      "format-version" -> 2,
      "table-uuid" -> java.util.UUID.randomUUID().toString,
      "location" -> dir.toString,
      "last-sequence-number" -> 1, "last-updated-ms" -> 1700000000000L,
      "last-column-id" -> 2, "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
        "fields" -> Seq(
          Map("id" -> 1, "name" -> "a", "required" -> false, "type" -> "long"),
          Map("id" -> 2, "name" -> "b", "required" -> false, "type" -> "long")))),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Nil)),
      "last-partition-id" -> 999, "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
      "properties" -> Map.empty, "current-snapshot-id" -> 42,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> 42, "timestamp-ms" -> 1700000000000L,
        "sequence-number" -> 1, "schema-id" -> 0,
        "summary" -> Map("operation" -> "append"),
        "manifest-list" -> s"file:$listPath")),
      "snapshot-log" -> Nil, "metadata-log" -> Nil))
      .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))

    val t = LakeTable.convert(spark, dir.toString)
    graft.log.ColumnIds.mapped(t.snapshot().schema) shouldBe true
    // by-id reads are correct: footer 'b' bytes surface as column 'a'
    t.read().agg(max("a"), max("b")).head() match { case r =>
      r.getLong(0) shouldBe 104L
      r.getLong(1) shouldBe 4L
    }
    // the poison check: footer column 'b' (id 1) must NOT have landed its
    // min/max under schema column 'b' (id 2) — exact metadata-only answers
    // would have reported max(b) = 104 against a true max of 4
    t.statsMinMax("b") shouldBe None
  }

  // ---- rewrite-import fixtures: transforms + deletes + v1 shapes ----

  /** Entry schema for transform/delete fixtures: INT partition field
    * (days/bucket tuple form), equality_ids, explicit entry seq absent —
    * sequence numbers inherit from the manifest list rows. */
  private val entrySchema2 = new org.apache.avro.Schema.Parser().parse("""{
    "type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"sequence_number","type":["null","long"],"default":null},
      {"name":"data_file","type":{
        "type":"record","name":"r2","fields":[
          {"name":"content","type":"int"},
          {"name":"file_path","type":"string"},
          {"name":"file_format","type":"string"},
          {"name":"partition","type":{
            "type":"record","name":"r102","fields":[
              {"name":"p_int","type":["null","int"],"default":null}]}},
          {"name":"record_count","type":"long"},
          {"name":"file_size_in_bytes","type":"long"},
          {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""")

  /** `explicitSeq`/`status = 0` model a compaction-born EXISTING entry: a
    * new path carrying its OLD data sequence number (the Iceberg spec
    * requires EXISTING entries to spell their sequence explicitly instead
    * of inheriting the manifest's). */
  private def entry2(content: Int, path: Path, count: Long,
      partValue: Integer = null, eqIds: Seq[Int] = Nil,
      explicitSeq: java.lang.Long = null, status: Int = 1): GenericRecord = {
    val dfs = entrySchema2.getField("data_file").schema()
    val part = new GenericData.Record(dfs.getField("partition").schema())
    part.put("p_int", partValue)
    val d = new GenericData.Record(dfs)
    d.put("content", content)
    d.put("file_path", s"file:$path")
    d.put("file_format", "PARQUET")
    d.put("partition", part)
    d.put("record_count", count)
    d.put("file_size_in_bytes", Files.size(path))
    if (eqIds.nonEmpty)
      d.put("equality_ids", eqIds.map(Integer.valueOf).asJava)
    val e = new GenericData.Record(entrySchema2)
    e.put("status", status)
    if (explicitSeq != null) e.put("sequence_number", explicitSeq)
    e.put("data_file", d)
    e
  }

  private def listRowSeq(path: Path, content: Int, seq: Long,
      specId: Int = 0): GenericRecord = {
    val r = new GenericData.Record(listSchema)
    r.put("manifest_path", s"file:$path")
    r.put("manifest_length", Files.size(path))
    r.put("partition_spec_id", specId)
    r.put("content", content)
    r.put("sequence_number", seq)
    r.put("min_sequence_number", seq)
    r.put("added_snapshot_id", 42L)
    r
  }

  /** One parquet file under `dir` from `df`, field ids via the caller. */
  private def rawFile(dir: Path, name: String,
      df: org.apache.spark.sql.DataFrame): Path = {
    val staging = Files.createTempDirectory("foreign-raw-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.resolve("out").toString)
    val part = {
      val s = Files.list(staging.resolve("out"))
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.createDirectories(dir)
    Files.move(part, dir.resolve(name))
    graft.log.TxLog.deleteRecursively(staging)
    dir.resolve(name)
  }

  private def fid(id: Long) = new org.apache.spark.sql.types.MetadataBuilder()
    .putLong("parquet.field.id", id).build()

  test("rewrite-import: days(ts) layout becomes a generated DATE partition " +
    "column; position deletes and sequence-gated equality deletes apply") {
    val dir = tmpDir("foreign-rewrite").resolve("t")
    // schema: id(1 long), ts(2 timestamptz), v(3 string); days(ts) spec
    def mk(rows: Seq[(Long, String, String)]): org.apache.spark.sql.DataFrame =
      rows.toDF("id", "ts0", "v")
        .select(col("id").as("id", fid(1)),
          col("ts0").cast("timestamp").as("ts", fid(2)),
          col("v").as("v", fid(3)))
    // f1 (seq 1): ids 1-4, two days; position 1 (id 2) will be pos-deleted
    val f1 = rawFile(dir, "f1.parquet", mk(Seq(
      (1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-01 11:00:00", "b"),
      (3L, "2024-01-02 10:00:00", "c"), (4L, "2024-01-02 11:00:00", "d"))))
    // f2 (seq 1): ids 10-13; id 12 equality-deleted at seq 2
    val f2 = rawFile(dir, "f2.parquet", mk(Seq(
      (10L, "2024-01-01 09:00:00", "e"), (11L, "2024-01-02 09:00:00", "f"),
      (12L, "2024-01-01 08:00:00", "g"), (13L, "2024-01-02 08:00:00", "h"))))
    // f3 (seq 3, AFTER the delete): carries id 21, which the seq-2 delete
    // lists — the strictly-smaller rule must NOT delete it
    val f3 = rawFile(dir, "f3.parquet", mk(Seq(
      (20L, "2024-01-03 10:00:00", "i"), (21L, "2024-01-03 11:00:00", "j"))))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    // position delete: position 1 of f1
    val posDel = rawFile(metaDir, "del-pos.parquet",
      Seq((s"file:$f1", 1L)).toDF("file_path", "pos"))
    // equality delete (seq 2) on field id 1: ids {12, 21}
    val eqDel = rawFile(metaDir, "del-eq.parquet",
      Seq(12L, 21L).toDF("id0").select(col("id0").as("id", fid(1))))
    val m12 = metaDir.resolve("m-12.avro")
    writeAvro(m12, entrySchema2, Seq(
      entry2(0, f1, 4L, 19723), entry2(0, f2, 4L, 19723)))
    val mEq = metaDir.resolve("m-eq.avro")
    writeAvro(mEq, entrySchema2, Seq(entry2(2, eqDel, 2L, eqIds = Seq(1))))
    val m3 = metaDir.resolve("m-3.avro")
    writeAvro(m3, entrySchema2, Seq(entry2(0, f3, 2L, 19725)))
    val mPos = metaDir.resolve("m-pos.avro")
    writeAvro(mPos, entrySchema2, Seq(entry2(1, posDel, 1L)))
    val listPath = metaDir.resolve("snap-42.avro")
    // the equality delete rides the UNPARTITIONED spec (id 1) — the real
    // Flink-CDC global-delete shape; a partitioned-spec delete would scope
    // to its own partition (covered by the scoped-delete test below)
    writeAvro(listPath, listSchema, Seq(
      listRowSeq(m12, 0, 1L), listRowSeq(mEq, 1, 2L, specId = 1),
      listRowSeq(m3, 0, 3L), listRowSeq(mPos, 1, 3L)))
    Files.write(metaDir.resolve("v1.metadata.json"), json(Map(
      "format-version" -> 2,
      "table-uuid" -> java.util.UUID.randomUUID().toString,
      "location" -> dir.toString,
      "last-sequence-number" -> 3, "last-updated-ms" -> 1700000000000L,
      "last-column-id" -> 3, "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
        "fields" -> Seq(
          Map("id" -> 1, "name" -> "id", "required" -> false, "type" -> "long"),
          Map("id" -> 2, "name" -> "ts", "required" -> false, "type" -> "timestamptz"),
          Map("id" -> 3, "name" -> "v", "required" -> false, "type" -> "string")))),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(
        Map("spec-id" -> 0, "fields" -> Seq(Map(
          "name" -> "p_int", "transform" -> "days",
          "source-id" -> 2, "field-id" -> 1000))),
        Map("spec-id" -> 1, "fields" -> Nil)),
      "last-partition-id" -> 1000, "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
      "properties" -> Map("write.metadata.compression-codec" -> "none"),
      "current-snapshot-id" -> 42,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> 42, "timestamp-ms" -> 1700000000000L,
        "sequence-number" -> 3, "schema-id" -> 0,
        "summary" -> Map("operation" -> "overwrite"),
        "manifest-list" -> s"file:$listPath")),
      "snapshot-log" -> Nil, "metadata-log" -> Nil))
      .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))

    // zero-copy refuses the transform and names the remedy
    intercept[IllegalArgumentException] {
      LakeTable.convert(spark, dir.toString)
    }.getMessage should include("convertRewrite")

    val dest = tmpDir("foreign-rewrite").resolve("dest").toString
    val t = IcebergImport.convertRewrite(spark, dir.toString, dest)
    // pos-delete dropped id 2; eq-delete dropped 12 (seq 1 < 2) but NOT 21
    // (seq 3 > 2 — strictly-smaller rule)
    t.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 3L, 4L, 10L, 11L, 13L, 20L, 21L)
    // the days layout carried over as a generated DATE partition column
    t.snapshot().metadata.partitionColumns shouldBe Seq("p_int")
    t.properties("graft.generated.p_int") shouldBe "CAST(`ts` AS DATE)"
    t.read().filter(col("p_int") =!= col("ts").cast("date")).count() shouldBe 0
    // partition pruning on the generated column works
    val full = t.snapshot().numFiles
    t.read(Seq(col("p_int") === java.sql.Date.valueOf("2024-01-03")))
      .inputFiles.length should be < full
    // appends keep computing the generated column
    t.append(Seq((30L, "2024-01-04 10:00:00", "k")).toDF("id", "ts0", "v")
      .select(col("id"), col("ts0").cast("timestamp").as("ts"), col("v")))
    t.read().filter(col("p_int") === java.sql.Date.valueOf("2024-01-04"))
      .select("id").as[Long].collect().toSeq shouldBe Seq(30L)
  }

  test("rewrite-import: a PARTITIONED-spec equality delete scopes to its " +
    "own partition — the same key in another partition survives") {
    val dir = tmpDir("foreign-rewrite-scope").resolve("t")
    def mk(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame =
      rows.toDF("id", "ts0")
        .select(col("id").as("id", fid(1)),
          col("ts0").cast("timestamp").as("ts", fid(2)))
    // fA: day 100 (epoch-day tuple), ids {1,2}; fB: day 101, ids {2,3}
    val fA = rawFile(dir, "fa.parquet", mk(Seq(
      (1L, "1970-04-11 10:00:00"), (2L, "1970-04-11 11:00:00"))))
    val fB = rawFile(dir, "fb.parquet", mk(Seq(
      (2L, "1970-04-12 10:00:00"), (3L, "1970-04-12 11:00:00"))))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    // scoped equality delete (day-100 partition, seq 2): key id=2 —
    // deletes 2 from fA (same partition) but NOT from fB (day 101)
    val eqDel = rawFile(metaDir, "del-eq.parquet",
      Seq(2L).toDF("id0").select(col("id0").as("id", fid(1))))
    val mData = metaDir.resolve("m-data.avro")
    writeAvro(mData, entrySchema2, Seq(
      entry2(0, fA, 2L, 100), entry2(0, fB, 2L, 101)))
    val mEq = metaDir.resolve("m-eq.avro")
    writeAvro(mEq, entrySchema2, Seq(entry2(2, eqDel, 1L, 100, Seq(1))))
    val listPath = metaDir.resolve("snap-42.avro")
    writeAvro(listPath, listSchema,
      Seq(listRowSeq(mData, 0, 1L), listRowSeq(mEq, 1, 2L)))
    Files.write(metaDir.resolve("v1.metadata.json"), json(Map(
      "format-version" -> 2,
      "table-uuid" -> java.util.UUID.randomUUID().toString,
      "location" -> dir.toString,
      "last-sequence-number" -> 2, "last-updated-ms" -> 1700000000000L,
      "last-column-id" -> 2, "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
        "fields" -> Seq(
          Map("id" -> 1, "name" -> "id", "required" -> false, "type" -> "long"),
          Map("id" -> 2, "name" -> "ts", "required" -> false, "type" -> "timestamptz")))),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Seq(Map(
        "name" -> "p_int", "transform" -> "days",
        "source-id" -> 2, "field-id" -> 1000)))),
      "last-partition-id" -> 1000, "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
      "properties" -> Map.empty, "current-snapshot-id" -> 42,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> 42, "timestamp-ms" -> 1700000000000L,
        "sequence-number" -> 2, "schema-id" -> 0,
        "summary" -> Map("operation" -> "overwrite"),
        "manifest-list" -> s"file:$listPath")),
      "snapshot-log" -> Nil, "metadata-log" -> Nil))
      .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))
    val dest = tmpDir("foreign-rewrite-scope").resolve("dest").toString
    val t = IcebergImport.convertRewrite(spark, dir.toString, dest)
    // fA lost its id=2 (same partition, seq 1 < 2); fB's id=2 SURVIVES
    // (day 101 — a different partition of the same spec)
    t.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 2L, 3L)
    t.read().filter(col("p_int") === java.sql.Date.valueOf("1970-04-12"))
      .select("id").as[Long].collect().sorted.toSeq shouldBe Seq(2L, 3L)
  }

  /** Publish metadata version `v` for the days(ts)-layout schema
    * (id long / ts timestamptz / v string; spec 0 = days(ts) as `p_int`,
    * spec 1 = unpartitioned) whose current snapshot lists `manifests` —
    * one foreign writer commit in the rewrite-sync lifecycle. */
  private def publishDays(dir: Path, v: Long, seq: Long,
      manifests: Seq[GenericRecord]): Unit = {
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val listPath = metaDir.resolve(s"snap-$v.avro")
    writeAvro(listPath, listSchema, manifests)
    Files.write(metaDir.resolve(s"v$v.metadata.json"), json(Map(
      "format-version" -> 2,
      "table-uuid" -> java.util.UUID.randomUUID().toString,
      "location" -> dir.toString,
      "last-sequence-number" -> seq, "last-updated-ms" -> 1700000000000L,
      "last-column-id" -> 3, "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
        "fields" -> Seq(
          Map("id" -> 1, "name" -> "id", "required" -> false, "type" -> "long"),
          Map("id" -> 2, "name" -> "ts", "required" -> false, "type" -> "timestamptz"),
          Map("id" -> 3, "name" -> "v", "required" -> false, "type" -> "string")))),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(
        Map("spec-id" -> 0, "fields" -> Seq(Map(
          "name" -> "p_int", "transform" -> "days",
          "source-id" -> 2, "field-id" -> 1000))),
        Map("spec-id" -> 1, "fields" -> Nil)),
      "last-partition-id" -> 1000, "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
      "properties" -> Map.empty,
      "current-snapshot-id" -> (41 + v),
      "snapshots" -> Seq(Map(
        "snapshot-id" -> (41 + v), "timestamp-ms" -> 1700000000000L,
        "sequence-number" -> seq, "schema-id" -> 0,
        "summary" -> Map("operation" -> "overwrite"),
        "manifest-list" -> s"file:$listPath")),
      "snapshot-log" -> Nil, "metadata-log" -> Nil))
      .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      v.toString.getBytes(StandardCharsets.UTF_8)): Unit
  }

  private def mkDays(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "ts0", "v")
      .select(col("id").as("id", fid(1)),
        col("ts0").cast("timestamp").as("ts", fid(2)),
        col("v").as("v", fid(3)))

  test("followable rewrite: syncRewrite follows appends, removes, position " +
    "deletes, and equality deletes; replay no-ops; OPTIMIZE between syncs " +
    "is fine; local DML and the in-place sync refuse") {
    val dir = tmpDir("foreign-rwsync").resolve("t")
    // f1 (seq 1): ids 1-4 over two days; f2 (seq 1): ids 10-11
    val f1 = rawFile(dir, "f1.parquet", mkDays(Seq(
      (1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-01 11:00:00", "b"),
      (3L, "2024-01-02 10:00:00", "c"), (4L, "2024-01-02 11:00:00", "d"))))
    val f2 = rawFile(dir, "f2.parquet", mkDays(Seq(
      (10L, "2024-01-01 09:00:00", "e"), (11L, "2024-01-02 09:00:00", "f"))))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val m1 = metaDir.resolve("m-1.avro")
    writeAvro(m1, entrySchema2, Seq(entry2(0, f1, 4L, 19723)))
    val m2 = metaDir.resolve("m-2.avro")
    writeAvro(m2, entrySchema2, Seq(entry2(0, f2, 2L, 19723)))
    publishDays(dir, 1, 1L, Seq(listRowSeq(m1, 0, 1L), listRowSeq(m2, 0, 1L)))

    val destDir = tmpDir("foreign-rwsync").resolve("dest").toString
    val t = IcebergImport.convertRewrite(spark, dir.toString, destDir,
      follow = true)
    t.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 2L, 3L, 4L, 10L, 11L)
    // lineage rides the rows: source file + position, root-relative
    t.read().filter(col("_src_file") === "f1.parquet").count() shouldBe 4
    t.read().filter(col("_src_file") === "f2.parquet" && col("_src_pos") === 1)
      .select("id").as[Long].collect().toSeq shouldBe Seq(11L)

    // the source advances: f2 compacted away, a position delete on f1
    // pos 1 (id 2, seq 2), an equality delete on ids {3, 21} (seq 2,
    // unpartitioned spec), and f3 appended at seq 3 — f3's id 21
    // postdates the delete, so the strictly-smaller rule must keep it
    val f3 = rawFile(dir, "f3.parquet", mkDays(Seq(
      (20L, "2024-01-03 10:00:00", "i"), (21L, "2024-01-03 11:00:00", "j"))))
    val posDel = rawFile(metaDir, "del-pos.parquet",
      Seq((s"file:$f1", 1L)).toDF("file_path", "pos"))
    val eqDel = rawFile(metaDir, "del-eq.parquet",
      Seq(3L, 21L).toDF("id0").select(col("id0").as("id", fid(1))))
    val m3 = metaDir.resolve("m-3.avro")
    writeAvro(m3, entrySchema2, Seq(entry2(0, f3, 2L, 19725)))
    val mPos = metaDir.resolve("m-pos.avro")
    writeAvro(mPos, entrySchema2, Seq(entry2(1, posDel, 1L)))
    val mEq = metaDir.resolve("m-eq.avro")
    writeAvro(mEq, entrySchema2, Seq(entry2(2, eqDel, 2L, eqIds = Seq(1))))
    publishDays(dir, 2, 3L, Seq(listRowSeq(m1, 0, 1L),
      listRowSeq(mEq, 1, 2L, specId = 1), listRowSeq(m3, 0, 3L),
      listRowSeq(mPos, 1, 2L)))

    val v1 = IcebergImport.syncRewrite(spark, dir.toString, destDir)
    val t2 = LakeTable.forPath(spark, destDir)
    // f1 lost id 2 (pos-delete) and id 3 (eq-delete, seq 1 < 2); f2's
    // rows followed its removal; f3's 20 and 21 arrived (21 survives the
    // delete: seq 3 > 2)
    t2.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 4L, 20L, 21L)
    // generated day keys recomputed on the appended rows; pruning works
    t2.read().filter(col("p_int") =!= col("ts").cast("date"))
      .count() shouldBe 0
    t2.read(Seq(col("p_int") === java.sql.Date.valueOf("2024-01-03")))
      .inputFiles.length should be < t2.snapshot().numFiles
    // replay: no-op, same version, same rows
    IcebergImport.syncRewrite(spark, dir.toString, destDir) shouldBe v1
    t2.read().count() shouldBe 4
    // the in-place sync names the right tool for a rewrite destination
    intercept[IllegalArgumentException] {
      IcebergImport.sync(spark, destDir)
    }.getMessage should include("syncRewrite")
    // OPTIMIZE between syncs is allowed — lineage rides the rows through
    // compaction — and the next sync still follows
    LakeTable.forPath(spark, destDir).optimizeCompact(): Unit
    val f4 = rawFile(dir, "f4.parquet", mkDays(Seq(
      (30L, "2024-01-04 10:00:00", "k"))))
    val m4 = metaDir.resolve("m-4.avro")
    writeAvro(m4, entrySchema2, Seq(entry2(0, f4, 1L, 19726)))
    publishDays(dir, 3, 4L, Seq(listRowSeq(m1, 0, 1L),
      listRowSeq(mEq, 1, 2L, specId = 1), listRowSeq(m3, 0, 3L),
      listRowSeq(mPos, 1, 2L), listRowSeq(m4, 0, 4L)))
    IcebergImport.syncRewrite(spark, dir.toString, destDir)
    LakeTable.forPath(spark, destDir).read()
      .select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 4L, 20L, 21L, 30L)
    // local DML is the cut-over moment
    LakeTable.forPath(spark, destDir).delete(col("id") === 1L)
    intercept[IllegalArgumentException] {
      IcebergImport.syncRewrite(spark, dir.toString, destDir)
    }.getMessage should include("cut-over")
  }

  test("syncRewrite follows a source-side COMPACTION: new paths carrying " +
    "OLD data sequence numbers re-import without row loss, and a live " +
    "equality delete the compactor did not apply still applies") {
    val dir = tmpDir("foreign-rwsync-compact").resolve("t")
    val f1 = rawFile(dir, "f1.parquet", mkDays(Seq(
      (1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-01 11:00:00", "b"),
      (3L, "2024-01-02 10:00:00", "c"), (4L, "2024-01-02 11:00:00", "d"))))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val m1 = metaDir.resolve("m-1.avro")
    writeAvro(m1, entrySchema2, Seq(entry2(0, f1, 4L, 19723)))
    publishDays(dir, 1, 1L, Seq(listRowSeq(m1, 0, 1L)))
    val destDir = tmpDir("foreign-rwsync-compact").resolve("dest").toString
    IcebergImport.convertRewrite(spark, dir.toString, destDir, follow = true)

    // v2 (seq 2): an equality delete on id 2 arrives; f1 still live
    val eqDel = rawFile(metaDir, "del-eq.parquet",
      Seq(2L).toDF("id0").select(col("id0").as("id", fid(1))))
    val mEq = metaDir.resolve("m-eq.avro")
    writeAvro(mEq, entrySchema2, Seq(entry2(2, eqDel, 1L, eqIds = Seq(1))))
    publishDays(dir, 2, 2L, Seq(listRowSeq(m1, 0, 1L),
      listRowSeq(mEq, 1, 2L, specId = 1)))
    IcebergImport.syncRewrite(spark, dir.toString, destDir)
    LakeTable.forPath(spark, destDir).read()
      .select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 3L, 4L)

    // v3 (seq 3): a compactor rewrites f1 -> f1c WITHOUT applying the
    // equality delete — an EXISTING entry at the OLD sequence (1), so the
    // live delete (seq 2) still logically masks id 2 in the new file
    val f1c = rawFile(dir, "f1c.parquet", mkDays(Seq(
      (1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-01 11:00:00", "b"),
      (3L, "2024-01-02 10:00:00", "c"), (4L, "2024-01-02 11:00:00", "d"))))
    val m1c = metaDir.resolve("m-1c.avro")
    writeAvro(m1c, entrySchema2, Seq(
      entry2(0, f1c, 4L, 19723, explicitSeq = 1L, status = 0)))
    publishDays(dir, 3, 3L, Seq(listRowSeq(m1c, 0, 3L),
      listRowSeq(mEq, 1, 2L, specId = 1)))
    IcebergImport.syncRewrite(spark, dir.toString, destDir)
    val after = LakeTable.forPath(spark, destDir).read()
    // no row loss, no duplicates, and id 2 stays deleted (old seq + live
    // delete); lineage now points at the compacted file
    after.select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 3L, 4L)
    after.select("_src_file").distinct().as[String].collect().toSeq shouldBe
      Seq("f1c.parquet")

    // v4 (seq 4): id 2 is RE-INSERTED — it postdates the seq-2 delete
    val f2 = rawFile(dir, "f2.parquet", mkDays(Seq(
      (2L, "2024-01-05 10:00:00", "b2"))))
    val m2 = metaDir.resolve("m-2.avro")
    writeAvro(m2, entrySchema2, Seq(entry2(0, f2, 1L, 19727)))
    publishDays(dir, 4, 4L, Seq(listRowSeq(m1c, 0, 3L),
      listRowSeq(mEq, 1, 2L, specId = 1), listRowSeq(m2, 0, 4L)))
    IcebergImport.syncRewrite(spark, dir.toString, destDir)
    LakeTable.forPath(spark, destDir).read()
      .select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 2L, 3L, 4L)
    // v5 (seq 5): the DELETE FILE itself compacts — a new path carrying
    // the OLD sequence (2). The sync sees it as a new delete file by
    // path; the lineage sequence gate must keep the re-inserted id 2
    // (its data sequence 4 postdates the delete's 2)
    val eqDel2 = rawFile(metaDir, "del-eq-c.parquet",
      Seq(2L).toDF("id0").select(col("id0").as("id", fid(1))))
    val mEq2 = metaDir.resolve("m-eq-c.avro")
    writeAvro(mEq2, entrySchema2, Seq(entry2(2, eqDel2, 1L, eqIds = Seq(1))))
    publishDays(dir, 5, 5L, Seq(listRowSeq(m1c, 0, 3L),
      listRowSeq(mEq2, 1, 2L, specId = 1), listRowSeq(m2, 0, 4L)))
    IcebergImport.syncRewrite(spark, dir.toString, destDir)
    LakeTable.forPath(spark, destDir).read()
      .select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 2L, 3L, 4L)
  }

  test("syncRewrite refusals: a one-shot destination, a scoped equality " +
    "delete against imported rows, and a source partition-spec change " +
    "all refuse loudly; a lineage-name collision refuses at import") {
    val dir = tmpDir("foreign-rwsync-refuse").resolve("t")
    val f1 = rawFile(dir, "f1.parquet", mkDays(Seq(
      (1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-02 11:00:00", "b"))))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val m1 = metaDir.resolve("m-1.avro")
    writeAvro(m1, entrySchema2, Seq(entry2(0, f1, 2L, 19723)))
    publishDays(dir, 1, 1L, Seq(listRowSeq(m1, 0, 1L)))
    // one-shot (follow = false) destination carries no lineage
    val oneShot = tmpDir("foreign-rwsync-refuse").resolve("oneshot").toString
    IcebergImport.convertRewrite(spark, dir.toString, oneShot)
    intercept[IllegalArgumentException] {
      IcebergImport.syncRewrite(spark, dir.toString, oneShot)
    }.getMessage should include("follow = true")
    val destDir = tmpDir("foreign-rwsync-refuse").resolve("dest").toString
    IcebergImport.convertRewrite(spark, dir.toString, destDir, follow = true)
    // a PARTITION-SCOPED equality delete cannot apply to already-imported
    // rows (the source tuple does not exist on the rewritten layout)
    val eqDel = rawFile(metaDir, "del-eq.parquet",
      Seq(1L).toDF("id0").select(col("id0").as("id", fid(1))))
    val mEq = metaDir.resolve("m-eq.avro")
    writeAvro(mEq, entrySchema2, Seq(entry2(2, eqDel, 1L, 19723, Seq(1))))
    publishDays(dir, 2, 2L, Seq(listRowSeq(m1, 0, 1L),
      listRowSeq(mEq, 1, 2L)))
    intercept[IllegalArgumentException] {
      IcebergImport.syncRewrite(spark, dir.toString, destDir)
    }.getMessage should include("partition scope")
    // a spec change is a re-layout: refuse (publish v3 with an hours()
    // spec under the same schema)
    val listPath = metaDir.resolve("snap-respec.avro")
    writeAvro(listPath, listSchema, Seq(listRowSeq(m1, 0, 1L)))
    Files.write(metaDir.resolve("v3.metadata.json"), json(Map(
      "format-version" -> 2,
      "table-uuid" -> java.util.UUID.randomUUID().toString,
      "location" -> dir.toString,
      "last-sequence-number" -> 3, "last-updated-ms" -> 1700000000000L,
      "last-column-id" -> 3, "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
        "fields" -> Seq(
          Map("id" -> 1, "name" -> "id", "required" -> false, "type" -> "long"),
          Map("id" -> 2, "name" -> "ts", "required" -> false, "type" -> "timestamptz"),
          Map("id" -> 3, "name" -> "v", "required" -> false, "type" -> "string")))),
      "default-spec-id" -> 2,
      "partition-specs" -> Seq(
        Map("spec-id" -> 0, "fields" -> Seq(Map(
          "name" -> "p_int", "transform" -> "days",
          "source-id" -> 2, "field-id" -> 1000))),
        Map("spec-id" -> 2, "fields" -> Seq(Map(
          "name" -> "p_int", "transform" -> "hours",
          "source-id" -> 2, "field-id" -> 1001)))),
      "last-partition-id" -> 1001, "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
      "properties" -> Map.empty, "current-snapshot-id" -> 44,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> 44, "timestamp-ms" -> 1700000000000L,
        "sequence-number" -> 3, "schema-id" -> 0,
        "summary" -> Map("operation" -> "overwrite"),
        "manifest-list" -> s"file:$listPath")),
      "snapshot-log" -> Nil, "metadata-log" -> Nil))
      .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "3".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] {
      IcebergImport.syncRewrite(spark, dir.toString, destDir)
    }.getMessage should include("partition spec changed")
    // a source column named like the lineage column refuses follow mode
    val dir2 = tmpDir("foreign-rwsync-refuse").resolve("t2")
    val clash = rawFile(dir2, "c.parquet",
      Seq((1L, "x")).toDF("id", "sf").select(col("id").as("id", fid(1)),
        col("sf").as("_src_file", fid(2))))
    val metaDir2 = dir2.resolve("metadata")
    Files.createDirectories(metaDir2)
    val mC = metaDir2.resolve("m-c.avro")
    writeAvro(mC, entrySchema2, Seq(entry2(0, clash, 1L)))
    val listC = metaDir2.resolve("snap-c.avro")
    writeAvro(listC, listSchema, Seq(listRowSeq(mC, 0, 1L)))
    Files.write(metaDir2.resolve("v1.metadata.json"), json(Map(
      "format-version" -> 2,
      "table-uuid" -> java.util.UUID.randomUUID().toString,
      "location" -> dir2.toString,
      "last-sequence-number" -> 1, "last-updated-ms" -> 1700000000000L,
      "last-column-id" -> 2, "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
        "fields" -> Seq(
          Map("id" -> 1, "name" -> "id", "required" -> false, "type" -> "long"),
          Map("id" -> 2, "name" -> "_src_file", "required" -> false,
            "type" -> "string")))),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Nil)),
      "last-partition-id" -> 999, "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
      "properties" -> Map.empty, "current-snapshot-id" -> 42,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> 42, "timestamp-ms" -> 1700000000000L,
        "sequence-number" -> 1, "schema-id" -> 0,
        "summary" -> Map("operation" -> "append"),
        "manifest-list" -> s"file:$listC")),
      "snapshot-log" -> Nil, "metadata-log" -> Nil))
      .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir2.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))
    val d2 = tmpDir("foreign-rwsync-refuse").resolve("d2").toString
    intercept[IllegalArgumentException] {
      IcebergImport.convertRewrite(spark, dir2.toString, d2, follow = true)
    }.getMessage should include("lineage")
    // follow = false imports it fine (no lineage columns added)
    IcebergImport.convertRewrite(spark, dir2.toString, d2)
      .read().count() shouldBe 1
  }

  test("syncRewrite re-applies an OLD live position delete to a RESTORED " +
    "path (remove + later re-add at its original sequence): the deleted " +
    "rows must not resurrect") {
    val dir = tmpDir("foreign-rwsync-restore").resolve("t")
    val f1 = rawFile(dir, "f1.parquet", mkDays(Seq(
      (1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-01 11:00:00", "b"),
      (3L, "2024-01-02 10:00:00", "c"), (4L, "2024-01-02 11:00:00", "d"))))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    // position delete (seq 2) masks f1 position 0 (id 1)
    val posDel = rawFile(metaDir, "del-pos.parquet",
      Seq((s"file:$f1", 0L)).toDF("file_path", "pos"))
    val m1 = metaDir.resolve("m-1.avro")
    writeAvro(m1, entrySchema2, Seq(entry2(0, f1, 4L, 19723)))
    val mPos = metaDir.resolve("m-pos.avro")
    writeAvro(mPos, entrySchema2, Seq(entry2(1, posDel, 1L)))
    publishDays(dir, 1, 2L, Seq(listRowSeq(m1, 0, 1L),
      listRowSeq(mPos, 1, 2L)))
    val destDir = tmpDir("foreign-rwsync-restore").resolve("dest").toString
    IcebergImport.convertRewrite(spark, dir.toString, destDir, follow = true)
    LakeTable.forPath(spark, destDir).read()
      .select("id").as[Long].collect().sorted.toSeq shouldBe Seq(2L, 3L, 4L)
    // v2 (seq 3): f1 removed; the delete file stays in the manifests
    publishDays(dir, 2, 3L, Seq(listRowSeq(mPos, 1, 2L)))
    IcebergImport.syncRewrite(spark, dir.toString, destDir)
    LakeTable.forPath(spark, destDir).read().count() shouldBe 0
    // v3 (seq 4): f1 RESTORED at its ORIGINAL sequence (EXISTING entry);
    // the old delete (seq 2 > 1) still masks it — re-importing without it
    // would resurrect id 1
    val m1r = metaDir.resolve("m-1r.avro")
    writeAvro(m1r, entrySchema2, Seq(
      entry2(0, f1, 4L, 19723, explicitSeq = 1L, status = 0)))
    publishDays(dir, 3, 4L, Seq(listRowSeq(m1r, 0, 4L),
      listRowSeq(mPos, 1, 2L)))
    IcebergImport.syncRewrite(spark, dir.toString, destDir)
    LakeTable.forPath(spark, destDir).read()
      .select("id").as[Long].collect().sorted.toSeq shouldBe Seq(2L, 3L, 4L)
  }

  test("syncRewrite refuses a destination missing the sequence lineage " +
    "column (built by an older rewrite) instead of failing mid-sync") {
    val dir = tmpDir("foreign-rwsync-old").resolve("t")
    val f1 = rawFile(dir, "f1.parquet", mkDays(Seq(
      (1L, "2024-01-01 10:00:00", "a"))))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val m1 = metaDir.resolve("m-1.avro")
    writeAvro(m1, entrySchema2, Seq(entry2(0, f1, 1L, 19723)))
    publishDays(dir, 1, 1L, Seq(listRowSeq(m1, 0, 1L)))
    // a destination shaped like the PRE-sequence-lineage layout: file +
    // position lineage only, follow properties pointing at the source
    val destDir = tmpDir("foreign-rwsync-old").resolve("dest").toString
    LakeTable.create(spark, destDir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("p_int",
          org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("_src_file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_src_pos",
          org.apache.spark.sql.types.LongType))),
      partitionColumns = Seq("p_int"),
      properties = Map(
        IcebergImport.RewriteFollowKey -> "true",
        IcebergImport.RewriteSourceKey ->
          dir.toAbsolutePath.normalize.toString,
        IcebergImport.RewriteSpecKey -> "p_int:ts:days",
        IcebergImport.SourceSeqKey -> "0",
        IcebergImport.SourceMetaVersionKey -> "0",
        "graft.generated.p_int" -> "CAST(`ts` AS DATE)"))
    intercept[IllegalArgumentException] {
      IcebergImport.syncRewrite(spark, dir.toString, destDir)
    }.getMessage should include("lineage column")
  }

  test("equality-delete scope across SPEC GENERATIONS: a scope implied by " +
    "the equality key applies cross-spec (Flink upsert shape); a genuine " +
    "tuple scope over mixed-spec live files refuses instead of silently " +
    "never matching") {
    val dir = tmpDir("foreign-crossspec").resolve("t")
    def mk(rows: Seq[(Long, String)]) = rows.toDF("id", "ts0")
      .select(col("id").as("id", fid(1)),
        col("ts0").cast("timestamp").as("ts", fid(2)))
    // fA under spec 0 = days(ts); fB under spec 2 = bucket[4](id) — the
    // table repartitioned between the two writes
    val fA = rawFile(dir, "fa.parquet", mk(Seq(
      (1L, "2024-01-01 10:00:00"), (5L, "2024-01-01 11:00:00"))))
    val fB = rawFile(dir, "fb.parquet", mk(Seq(
      (2L, "2024-01-02 10:00:00"), (5L, "2024-01-02 11:00:00"))))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val mA = metaDir.resolve("m-a.avro")
    writeAvro(mA, entrySchema2, Seq(entry2(0, fA, 2L, 19723)))
    val mB = metaDir.resolve("m-b.avro")
    writeAvro(mB, entrySchema2, Seq(entry2(0, fB, 2L, 1)))
    // the delete rides spec 2 (bucket over id) scoped to bucket 1 — but
    // its every scoped dimension's source column IS the equality key, so
    // the scope is implied by key equality and applies table-wide
    val eqImplied = rawFile(metaDir, "del-implied.parquet",
      Seq(5L).toDF("id0").select(col("id0").as("id", fid(1))))
    val mImp = metaDir.resolve("m-imp.avro")
    writeAvro(mImp, entrySchema2, Seq(entry2(2, eqImplied, 1L, 1, Seq(1))))
    def publish3(v: Long, seq: Long, manifests: Seq[GenericRecord]): Unit = {
      val listPath = metaDir.resolve(s"snap-x$v.avro")
      writeAvro(listPath, listSchema, manifests)
      Files.write(metaDir.resolve(s"v$v.metadata.json"), json(Map(
        "format-version" -> 2,
        "table-uuid" -> java.util.UUID.randomUUID().toString,
        "location" -> dir.toString,
        "last-sequence-number" -> seq, "last-updated-ms" -> 1700000000000L,
        "last-column-id" -> 2, "current-schema-id" -> 0,
        "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
          "fields" -> Seq(
            Map("id" -> 1, "name" -> "id", "required" -> false, "type" -> "long"),
            Map("id" -> 2, "name" -> "ts", "required" -> false,
              "type" -> "timestamptz")))),
        "default-spec-id" -> 2,
        "partition-specs" -> Seq(
          Map("spec-id" -> 0, "fields" -> Seq(Map(
            "name" -> "p_int", "transform" -> "days",
            "source-id" -> 2, "field-id" -> 1000))),
          Map("spec-id" -> 1, "fields" -> Nil),
          Map("spec-id" -> 2, "fields" -> Seq(Map(
            "name" -> "p_int", "transform" -> "bucket[4]",
            "source-id" -> 1, "field-id" -> 1001)))),
        "last-partition-id" -> 1001, "default-sort-order-id" -> 0,
        "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
        "properties" -> Map.empty, "current-snapshot-id" -> 42,
        "snapshots" -> Seq(Map(
          "snapshot-id" -> 42, "timestamp-ms" -> 1700000000000L,
          "sequence-number" -> seq, "schema-id" -> 0,
          "summary" -> Map("operation" -> "overwrite"),
          "manifest-list" -> s"file:$listPath")),
        "snapshot-log" -> Nil, "metadata-log" -> Nil))
        .getBytes(StandardCharsets.UTF_8))
      Files.write(metaDir.resolve("version-hint.text"),
        v.toString.getBytes(StandardCharsets.UTF_8)): Unit
    }
    publish3(1, 2L, Seq(listRowSeq(mA, 0, 1L, specId = 0),
      listRowSeq(mB, 0, 1L, specId = 2), listRowSeq(mImp, 1, 2L, specId = 2)))
    val d1 = tmpDir("foreign-crossspec").resolve("d1").toString
    val t = IcebergImport.convertRewrite(spark, dir.toString, d1)
    // id 5 deleted from BOTH files — fA's spec-0 tuple never blocked the
    // key-implied scope
    t.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 2L)
    // a GENUINE tuple scope (days over ts — ts is not in the key) over
    // mixed-spec live files refuses: tuples are not comparable across
    // spec generations, and silently never-matching would KEEP rows the
    // delete intended to remove
    val eqScoped = rawFile(metaDir, "del-scoped.parquet",
      Seq(1L).toDF("id0").select(col("id0").as("id", fid(1))))
    val mSc = metaDir.resolve("m-sc.avro")
    writeAvro(mSc, entrySchema2, Seq(entry2(2, eqScoped, 1L, 19723, Seq(1))))
    publish3(2, 3L, Seq(listRowSeq(mA, 0, 1L, specId = 0),
      listRowSeq(mB, 0, 1L, specId = 2), listRowSeq(mSc, 1, 3L, specId = 0)))
    val d2 = tmpDir("foreign-crossspec").resolve("d2").toString
    intercept[IllegalArgumentException] {
      IcebergImport.convertRewrite(spark, dir.toString, d2)
    }.getMessage should include("different spec")
  }

  test("equality-delete resolution GROUPS files by key set — N delete " +
    "files of one key set read as ONE grouped scan, not N plan legs " +
    "(the Flink-CDC thousands-of-delete-files shape)") {
    val dir = tmpDir("foreign-eqgroup").resolve("t")
    val f1 = rawFile(dir, "f1.parquet", mkDays(Seq(
      (1L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-01 11:00:00", "b"),
      (3L, "2024-01-02 10:00:00", "c"), (4L, "2024-01-02 11:00:00", "d"))))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    // 5 delete files keyed on id (field 1), 3 keyed on (id, v) (1 and 3)
    val idDels = (0 until 5).map { i =>
      rawFile(metaDir, s"eq-id-$i.parquet",
        Seq(100L + i).toDF("id0").select(col("id0").as("id", fid(1)))) }
    val pairDels = (0 until 3).map { i =>
      rawFile(metaDir, s"eq-pair-$i.parquet",
        Seq((200L + i, "x")).toDF("id0", "v0").select(
          col("id0").as("id", fid(1)), col("v0").as("v", fid(3)))) }
    val m1 = metaDir.resolve("m-1.avro")
    writeAvro(m1, entrySchema2, Seq(entry2(0, f1, 4L, 19723)))
    val mDels = (idDels.map(p => p -> Seq(1)) ++
      pairDels.map(p => p -> Seq(1, 3))).zipWithIndex.map {
      case ((p, ids), i) =>
        val mp = metaDir.resolve(s"m-eq-$i.avro")
        writeAvro(mp, entrySchema2, Seq(entry2(2, p, 1L, eqIds = ids)))
        mp
    }
    publishDays(dir, 1, 2L, listRowSeq(m1, 0, 1L) +:
      mDels.map(listRowSeq(_, 1, 2L, specId = 1)))
    val st = IcebergImport.replay(dir.toAbsolutePath.normalize)
    val groups = IcebergImport.resolveEqDeletes(st, st.eqDeletes)
    // 8 files -> exactly 2 groups (one per key set), each carrying ALL
    // its files for a single multi-path read
    groups.map { case (srcNames, keyFields, dels) =>
      (srcNames, keyFields.map(_.name), dels.size) } shouldBe Seq(
      (Seq("id"), Seq("id"), 5), (Seq("id", "v"), Seq("id", "v"), 3))
    groups.head._3.map(_.path).toSet shouldBe idDels.map(_.toString).toSet
    // and the import itself stays correct with the grouped shape
    val dest = tmpDir("foreign-eqgroup").resolve("dest").toString
    IcebergImport.convertRewrite(spark, dir.toString, dest)
      .read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 2L, 3L, 4L)
  }

  test("FOREIGN sort-order + Puffin statistics import: an identity default " +
    "sort order becomes declared clustering, theta NDV blobs become " +
    "distinctCount stats, unknown blob types skip, and a non-identity " +
    "order drops (advisory)") {
    val dir = tmpDir("foreign-stats").resolve("t")
    val fa = dataFile(dir, "data-a.parquet",
      (1L to 50L).map(i => (i, s"c${i % 7}")))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    val mData = metaDir.resolve("m-a.avro")
    writeAvro(mData, entrySchema, Seq(entry(
      (0, s"file:$fa", "PARQUET", 50L, Files.size(fa)), "x")))
    val listPath = metaDir.resolve("snap-42.avro")
    writeAvro(listPath, listSchema, Seq(listRowOf(mData, 0)))
    // hand-build the Puffin file RAW (independent of graft.table.Puffin):
    // a real theta sketch over 50 ids for field 1 + an unknown blob type
    val sketch = org.apache.datasketches.theta.UpdateSketch.builder().build()
    (1L to 50L).foreach(i => sketch.update(i): Unit)
    val skBytes = sketch.compact.toByteArray
    val junk = "not-a-sketch".getBytes(StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream()
    out.write("PFA1".getBytes(StandardCharsets.UTF_8))
    val skOff = out.size(); out.write(skBytes)
    val junkOff = out.size(); out.write(junk)
    val payload = json(Map(
      "blobs" -> Seq(
        Map("type" -> "apache-datasketches-theta-v1", "fields" -> Seq(1),
          "snapshot-id" -> 42, "sequence-number" -> 1,
          "offset" -> skOff, "length" -> skBytes.length,
          "properties" -> Map("ndv" -> "50")),
        Map("type" -> "some-future-blob-v9", "fields" -> Seq(2),
          "snapshot-id" -> 42, "sequence-number" -> 1,
          "offset" -> junkOff, "length" -> junk.length)),
      "properties" -> Map("created-by" -> "a foreign writer")))
      .getBytes(StandardCharsets.UTF_8)
    out.write("PFA1".getBytes(StandardCharsets.UTF_8))
    out.write(payload)
    val tail = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length); tail.putInt(0)
    out.write(tail.array())
    out.write("PFA1".getBytes(StandardCharsets.UTF_8))
    val statsPath = metaDir.resolve("foreign-stats.puffin")
    Files.write(statsPath, out.toByteArray)
    def publishWith(sortOrders: Seq[Map[String, Any]], defaultId: Int): Unit =
      Files.write(metaDir.resolve("v1.metadata.json"), json(Map(
        "format-version" -> 2,
        "table-uuid" -> java.util.UUID.randomUUID().toString,
        "location" -> dir.toString,
        "last-sequence-number" -> 1, "last-updated-ms" -> 1700000000000L,
        "last-column-id" -> 2, "current-schema-id" -> 0,
        "schemas" -> Seq(schemaJson("string")),
        "default-spec-id" -> 0,
        "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Nil)),
        "last-partition-id" -> 999,
        "default-sort-order-id" -> defaultId,
        "sort-orders" -> sortOrders,
        "statistics" -> Seq(Map(
          "snapshot-id" -> 42,
          "statistics-path" -> s"file:$statsPath",
          "file-size-in-bytes" -> Files.size(statsPath),
          "file-footer-size-in-bytes" -> (payload.length + 16),
          "blob-metadata" -> Nil)),
        "properties" -> Map.empty, "current-snapshot-id" -> 42,
        "snapshots" -> Seq(Map(
          "snapshot-id" -> 42, "timestamp-ms" -> 1700000000000L,
          "sequence-number" -> 1, "schema-id" -> 0,
          "summary" -> Map("operation" -> "append"),
          "manifest-list" -> s"file:$listPath")),
        "snapshot-log" -> Nil, "metadata-log" -> Nil))
        .getBytes(StandardCharsets.UTF_8)): Unit
    Files.write(metaDir.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))
    // identity default order over column id (source-id 1): follows
    publishWith(Seq(
      Map("order-id" -> 0, "fields" -> Nil),
      Map("order-id" -> 3, "fields" -> Seq(Map(
        "transform" -> "identity", "source-id" -> 1,
        "direction" -> "asc", "null-order" -> "nulls-first")))),
      defaultId = 3)
    val t = LakeTable.convert(spark, dir.toString)
    t.properties("graft.clusterBy") shouldBe "id"
    t.properties("stats.id.distinctCount") shouldBe "50"
    // the unknown blob type contributed nothing for column cat
    t.properties.get("stats.cat.distinctCount") shouldBe None
    // a NON-identity default order drops the clustering translation but
    // keeps the statistics (each advisory, independently)
    graft.log.TxLog.deleteRecursively(dir.resolve("_txlog"))
    publishWith(Seq(
      Map("order-id" -> 4, "fields" -> Seq(Map(
        "transform" -> "bucket[8]", "source-id" -> 1,
        "direction" -> "asc", "null-order" -> "nulls-first")))),
      defaultId = 4)
    val t2 = LakeTable.convert(spark, dir.toString)
    t2.properties.get("graft.clusterBy") shouldBe None
    t2.properties("stats.id.distinctCount") shouldBe "50"
  }

  test("a genuine v1 (legacy schema/partition-spec keys, no content or " +
    "sequence fields anywhere) imports zero-copy; sync keys on the " +
    "metadata version") {
    val dir = tmpDir("foreign-v1").resolve("t")
    val fa = dataFile(dir, "data-a.parquet", Seq((1L, "a"), (2L, "a")))
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    // v1 avro shapes: no content / sequence_number in either schema
    val v1List = new org.apache.avro.Schema.Parser().parse("""{
      "type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string"},
        {"name":"manifest_length","type":"long"},
        {"name":"partition_spec_id","type":"int"},
        {"name":"added_snapshot_id","type":"long"}]}""")
    val v1Entry = new org.apache.avro.Schema.Parser().parse("""{
      "type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int"},
        {"name":"data_file","type":{
          "type":"record","name":"r2","fields":[
            {"name":"file_path","type":"string"},
            {"name":"file_format","type":"string"},
            {"name":"partition","type":{
              "type":"record","name":"r102","fields":[
                {"name":"cat","type":["null","string"],"default":null}]}},
            {"name":"record_count","type":"long"},
            {"name":"file_size_in_bytes","type":"long"}]}}]}""")
    def v1EntryOf(path: Path, count: Long, cat: String): GenericRecord = {
      val dfs = v1Entry.getField("data_file").schema()
      val part = new GenericData.Record(dfs.getField("partition").schema())
      part.put("cat", cat)
      val d = new GenericData.Record(dfs)
      d.put("file_path", s"file:$path")
      d.put("file_format", "PARQUET")
      d.put("partition", part)
      d.put("record_count", count)
      d.put("file_size_in_bytes", Files.size(path))
      val e = new GenericData.Record(v1Entry)
      e.put("status", 1)
      e.put("data_file", d)
      e
    }
    def v1ListRow(path: Path): GenericRecord = {
      val r = new GenericData.Record(v1List)
      r.put("manifest_path", s"file:$path")
      r.put("manifest_length", Files.size(path))
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", 7L)
      r
    }
    def v1Meta(v: Long, listPath: Path, snapId: Long): String = json(Map(
      "format-version" -> 1,
      "table-uuid" -> "11111111-2222-3333-4444-000000000001",
      "location" -> dir.toString,
      "last-updated-ms" -> 1700000000000L, "last-column-id" -> 2,
      // v1 legacy keys: ONE schema, ONE flat partition-spec field list
      "schema" -> Map("type" -> "struct", "fields" -> Seq(
        Map("id" -> 1, "name" -> "id", "required" -> false, "type" -> "long"),
        Map("id" -> 2, "name" -> "cat", "required" -> false, "type" -> "string"))),
      "partition-spec" -> Seq(Map(
        "name" -> "cat", "transform" -> "identity",
        "source-id" -> 2, "field-id" -> 1000)),
      "properties" -> Map.empty,
      "current-snapshot-id" -> snapId,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> snapId, "timestamp-ms" -> 1700000000000L,
        "manifest-list" -> s"file:$listPath"))))
    val mA = metaDir.resolve("m-a.avro")
    writeAvro(mA, v1Entry, Seq(v1EntryOf(fa, 2L, "a")))
    val l1 = metaDir.resolve("snap-7.avro")
    writeAvro(l1, v1List, Seq(v1ListRow(mA)))
    Files.write(metaDir.resolve("v1.metadata.json"),
      v1Meta(1, l1, 7L).getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))
    val t = LakeTable.convert(spark, dir.toString)
    t.read().select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L)
    t.snapshot().metadata.partitionColumns shouldBe Seq("cat")
    t.properties(IcebergImport.SourceSeqKey) shouldBe "1" // metadata version
    // the v1 source commits again: new metadata version -> sync catches up
    val fb = dataFile(dir, "data-b.parquet", Seq((10L, "b"), (11L, "b")))
    val mB = metaDir.resolve("m-b.avro")
    writeAvro(mB, v1Entry, Seq(v1EntryOf(fb, 2L, "b")))
    val l2 = metaDir.resolve("snap-8.avro")
    writeAvro(l2, v1List, Seq(v1ListRow(mA), v1ListRow(mB)))
    Files.write(metaDir.resolve("v2.metadata.json"),
      v1Meta(2, l2, 8L).getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "2".getBytes(StandardCharsets.UTF_8))
    IcebergImport.sync(spark, dir.toString)
    val t2 = LakeTable.forPath(spark, dir.toString)
    t2.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 2L, 10L, 11L)
    t2.properties(IcebergImport.SourceSeqKey) shouldBe "2"
    // replay: no-op
    val v = t2.version
    IcebergImport.sync(spark, dir.toString) shouldBe v
    // the source UPGRADES to format-version 2 mid-cadence: the sequence
    // axis RESTARTS (last-sequence-number 1, far below the consumed 2) —
    // sync must key on the metadata version and keep following instead of
    // silently stalling until the source accumulates 2+ data commits
    val fc = dataFile(dir, "data-c.parquet", Seq((20L, "c"), (21L, "c")))
    val mC = metaDir.resolve("m-c.avro")
    writeAvro(mC, v1Entry, Seq(v1EntryOf(fc, 2L, "c")))
    val l3 = metaDir.resolve("snap-9.avro")
    writeAvro(l3, listSchema,
      Seq(listRowOf(mA, 0), listRowOf(mB, 0), listRowOf(mC, 0)))
    Files.write(metaDir.resolve("v3.metadata.json"), json(Map(
      "format-version" -> 2,
      "table-uuid" -> "11111111-2222-3333-4444-000000000001",
      "location" -> dir.toString,
      "last-sequence-number" -> 1, "last-updated-ms" -> 1700000001000L,
      "last-column-id" -> 2, "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
        "fields" -> Seq(
          Map("id" -> 1, "name" -> "id", "required" -> false, "type" -> "long"),
          Map("id" -> 2, "name" -> "cat", "required" -> false, "type" -> "string")))),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Seq(Map(
        "name" -> "cat", "transform" -> "identity",
        "source-id" -> 2, "field-id" -> 1000)))),
      "last-partition-id" -> 1000, "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
      "properties" -> Map.empty, "current-snapshot-id" -> 9,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> 9, "timestamp-ms" -> 1700000001000L,
        "sequence-number" -> 1, "schema-id" -> 0,
        "summary" -> Map("operation" -> "append"),
        "manifest-list" -> s"file:$l3")),
      "snapshot-log" -> Nil, "metadata-log" -> Nil))
      .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "3".getBytes(StandardCharsets.UTF_8))
    IcebergImport.sync(spark, dir.toString)
    val t3 = LakeTable.forPath(spark, dir.toString)
    t3.read().select("id").as[Long].collect().sorted.toSeq shouldBe
      Seq(1L, 2L, 10L, 11L, 20L, 21L)
    t3.properties(IcebergImport.SourceMetaVersionKey) shouldBe "3"
    // and the post-upgrade replay is a no-op again
    val v3v = t3.version
    IcebergImport.sync(spark, dir.toString) shouldBe v3v
  }

  test("sync FOLLOWS an Iceberg int->long widening metadata-only: old " +
    "files upcast, the typeWidening feature stamps, synced files carry " +
    "the heal tag; a PARTITION-column widening refuses (r13)") {
    def metaW(dir: Path, v: Long, snapId: Long, seq: Long, vType: String,
        listPath: Path, partitioned: Boolean): String = json(Map(
      "format-version" -> 2,
      "table-uuid" -> "cccccccc-0000-1111-2222-000000000001",
      "location" -> dir.toString,
      "last-sequence-number" -> seq, "last-updated-ms" -> 1700000000000L,
      "last-column-id" -> 1, "current-schema-id" -> 0,
      "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
        "fields" -> Seq(
          Map("id" -> 1, "name" -> "v", "required" -> false, "type" -> vType)))),
      "default-spec-id" -> 0,
      "partition-specs" -> Seq(Map("spec-id" -> 0,
        "fields" -> (if (!partitioned) Nil else Seq(Map(
          // the spec FIELD is named like the avro tuple record's field
          "name" -> "p_int", "transform" -> "identity",
          "source-id" -> 1, "field-id" -> 1000))))),
      "last-partition-id" -> 1000, "default-sort-order-id" -> 0,
      "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
      "properties" -> Map.empty, "current-snapshot-id" -> snapId,
      "snapshots" -> Seq(Map(
        "snapshot-id" -> snapId, "timestamp-ms" -> 1700000000000L,
        "sequence-number" -> seq, "schema-id" -> 0,
        "summary" -> Map("operation" -> "append"),
        "manifest-list" -> s"file:$listPath")),
      "snapshot-log" -> Nil, "metadata-log" -> Nil))
    def build(tag: String, partitioned: Boolean): (Path, Path) = {
      val dir = tmpDir(s"foreign-widen-$tag").resolve("t")
      val fa = rawFile(dir, "a.parquet", Seq(1, 2).toDF("v0")
        .select(col("v0").cast("int").as("v", fid(1))))
      val metaDir = dir.resolve("metadata")
      Files.createDirectories(metaDir)
      val mA = metaDir.resolve("m-a.avro")
      writeAvro(mA, entrySchema2, Seq(entry2(0, fa, 2L,
        if (partitioned) Integer.valueOf(1) else null)))
      val l1 = metaDir.resolve("snap-1.avro")
      writeAvro(l1, listSchema, Seq(listRowSeq(mA, 0, 1L)))
      Files.write(metaDir.resolve("v1.metadata.json"),
        metaW(dir, 1, 101L, 1L, "int", l1, partitioned)
          .getBytes(StandardCharsets.UTF_8))
      Files.write(metaDir.resolve("version-hint.text"),
        "1".getBytes(StandardCharsets.UTF_8))
      (dir, mA)
    }
    // --- unpartitioned: the widening follows ---
    val (dir, mA) = build("flat", partitioned = false)
    LakeTable.convert(spark, dir.toString)
    val fb = rawFile(dir, "b.parquet", Seq(5000000000L).toDF("v0")
      .select(col("v0").as("v", fid(1))))
    val metaDir = dir.resolve("metadata")
    val mB = metaDir.resolve("m-b.avro")
    writeAvro(mB, entrySchema2, Seq(entry2(0, fb, 1L)))
    val l2 = metaDir.resolve("snap-2.avro")
    writeAvro(l2, listSchema,
      Seq(listRowSeq(mA, 0, 1L), listRowSeq(mB, 0, 2L)))
    Files.write(metaDir.resolve("v2.metadata.json"),
      metaW(dir, 2, 102L, 2L, "long", l2, partitioned = false)
        .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "2".getBytes(StandardCharsets.UTF_8))
    IcebergImport.sync(spark, dir.toString)
    val t = LakeTable.forPath(spark, dir.toString)
    t.snapshot().schema("v").dataType shouldBe
      org.apache.spark.sql.types.LongType
    t.read().agg(sum("v")).head().getLong(0) shouldBe (1L + 2L + 5000000000L)
    graft.log.TypeWidening.hasChanges(t.snapshot().schema("v")) shouldBe true
    t.snapshot().protocol.writerSet should contain("typeWidening")
    // the synced file carries the heal tag (keyed by field id)
    t.snapshot().files.find(_.path == "b.parquet").get
      .tag("tc:1") shouldBe Some("1")
    // int->long stats stay exact: metadata-only min/max answers
    t.statsMinMax("v") shouldBe Some((1L, 5000000000L))
    // --- partitioned on v: the same widening refuses (partition values
    // re-parse as strings under the current type) ---
    val (dirP, mAP) = build("part", partitioned = true)
    LakeTable.convert(spark, dirP.toString)
    val metaDirP = dirP.resolve("metadata")
    val l2p = metaDirP.resolve("snap-2.avro")
    writeAvro(l2p, listSchema, Seq(listRowSeq(mAP, 0, 1L)))
    Files.write(metaDirP.resolve("v2.metadata.json"),
      metaW(dirP, 2, 102L, 2L, "long", l2p, partitioned = true)
        .getBytes(StandardCharsets.UTF_8))
    Files.write(metaDirP.resolve("version-hint.text"),
      "2".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] {
      IcebergImport.sync(spark, dirP.toString)
    }.getMessage should include("changed type")
  }

  test("identity partitions on types without a faithful string round-trip " +
    "refuse (a foreign timestamptz partition would import garbage)") {
    val dir = tmpDir("foreign-iceberg-ts").resolve("t")
    val metaDir = dir.resolve("metadata")
    Files.createDirectories(metaDir)
    Files.write(metaDir.resolve("v1.metadata.json"),
      metadataJson(dir, metaDir.resolve("snap-0.avro"), -1L,
        catType = "timestamptz").getBytes(StandardCharsets.UTF_8))
    Files.write(metaDir.resolve("version-hint.text"),
      "1".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] {
      LakeTable.convert(spark, dir.toString)
    }.getMessage should include("faithful string")
  }
}
