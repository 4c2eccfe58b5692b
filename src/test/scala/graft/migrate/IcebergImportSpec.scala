package graft.migrate

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable

/** Importing an Iceberg table in place. Fixtures come from the engine's
  * OWN Iceberg exporter ([[graft.table.Uniform]] — written to the public
  * spec and structurally validated by `Uniform.validateExport`), with the
  * graft log deleted afterward so what the importer sees is a pure
  * HadoopTables layout. Export and import never share replay code, so a
  * content round-trip checks both against the spec. */
class IcebergImportSpec extends SparkSpec {
  import spark.implicits._

  private def df3(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("id", "name", "amount")

  /** Create a graft table, export Iceberg metadata, DELETE the graft log —
    * leaving a pure Iceberg table at the returned path. */
  private def icebergFixture(tag: String,
      props: Map[String, String] = Map.empty,
      pcols: Seq[String] = Nil)(build: LakeTable => Unit): Path = {
    val dir = tmpDir(s"iceberg-$tag").resolve("t")
    val t =
      if (pcols.isEmpty)
        LakeTable.createFrom(spark, dir.toString,
          df3((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0)),
          properties = props)
      else {
        val c = LakeTable.create(spark, dir.toString,
          df3((1L, "a", 10.0)).schema, partitionColumns = pcols,
          properties = props, ifNotExists = false)
        c.append(df3((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0)))
        c
      }
    build(t)
    t.generateIcebergMetadata()
    graft.log.TxLog.deleteRecursively(dir.resolve("_txlog"))
    dir
  }

  test("round-trips an exported table: live files zero-copy, field ids " +
    "bind, footer-exact stats; convert is idempotent and DML works") {
    val dir = icebergFixture("basic") { t =>
      t.append(df3((4L, "c", 40.0)))
    }
    val t = LakeTable.convert(spark, dir.toString) // auto-detects metadata/
    t.read().orderBy("id").as[(Long, String, Double)].collect().toSeq shouldBe
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, "c", 40.0))
    // graft's own files carry field ids agreeing with the exported schema
    // -> the import keeps by-id resolution (a mapped graft table)
    graft.log.ColumnIds.mapped(t.snapshot().schema) shouldBe true
    // stats re-derived exactly from footers -> metadata-only answers
    t.statsMinMax("id") shouldBe Some((1L, 4L))
    val h = t.history(Some(1)).collect()(0)
    h.getString(3) shouldBe "CONVERT"
    h.getMap[String, String](4)("sourceFormat") shouldBe "iceberg"
    // idempotent
    LakeTable.convert(spark, dir.toString).version shouldBe t.version
    // a real ACID table: DML works
    t.delete(col("id") === 1L)
    t.read().count() shouldBe 3
  }

  test("position deletes transcode into graft deletion-vector masks") {
    val dir = icebergFixture("posdel",
      props = Map("graft.enableDeletionVectors" -> "true")) { t =>
      t.delete(col("name") === "a") // masks ids 1 and 3 via DVs
    }
    val t = LakeTable.convert(spark, dir.toString)
    t.read().select("id").as[Long].collect().toSeq shouldBe Seq(2L)
    t.snapshot().dvs.values.map(_.numDeleted).sum shouldBe 2
    t.snapshot().files.map(_.numRecords).sum shouldBe 3 // physical
    t.snapshot().protocol.writerSet should contain("deletionVectors")
  }

  test("a renamed column round-trips BY ID: old files keep the old footer " +
    "name, the field id binds them to the renamed column") {
    val dir = tmpDir("iceberg-rename").resolve("t")
    val t = LakeTable.createFrom(spark, dir.toString,
      df3((1L, "a", 10.0), (2L, "b", 20.0)))
    t.renameColumn("amount", "total") // metadata-only: files keep 'amount'
    t.append(Seq((3L, "c", 30.0)).toDF("id", "name", "total"))
    t.generateIcebergMetadata()
    graft.log.TxLog.deleteRecursively(dir.resolve("_txlog"))
    val t2 = LakeTable.convert(spark, dir.toString)
    t2.read().columns.toSeq shouldBe Seq("id", "name", "total")
    // the pre-rename file's values surface under the NEW name — by-id
    // binding, exactly what field ids exist for
    t2.read().agg(sum("total")).head().getDouble(0) shouldBe 60.0
    graft.log.ColumnIds.mapped(t2.snapshot().schema) shouldBe true
  }

  test("dangling position-delete rows (targets compacted away without a " +
    "delete rewrite) are ignored, not fatal") {
    val dir = icebergFixture("dangling",
      props = Map("graft.enableDeletionVectors" -> "true")) { t =>
      t.delete(col("id") === 1L)
    }
    // append a dangling row to the exported delete parquet: a path no
    // live data file has (Iceberg readers ignore such rows)
    val metaDir = dir.resolve("metadata")
    val deleteFile = {
      val s = Files.list(metaDir)
      try s.iterator().asScala.find(
        _.getFileName.toString.startsWith("delete-")).get
      finally s.close()
    }
    val rows = spark.read.parquet(deleteFile.toString)
    val extra = rows.limit(1).select(
      org.apache.spark.sql.functions.lit(s"$dir/compacted-away.parquet")
        .as("file_path"),
      org.apache.spark.sql.functions.lit(0L).as("pos"))
    val staging = Files.createTempDirectory("iceberg-dangling")
    rows.unionByName(extra).coalesce(1).write.mode("overwrite")
      .parquet(staging.resolve("out").toString)
    val part = {
      val s = Files.list(staging.resolve("out"))
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.move(part, deleteFile, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dropCrcSibling(deleteFile)
    val t = LakeTable.convert(spark, dir.toString)
    // the real mask applied; the dangling row vanished
    t.read().select("id").as[Long].collect().sorted.toSeq shouldBe Seq(2L, 3L)
    t.snapshot().dvs.values.map(_.numDeleted).sum shouldBe 1
  }

  test("identity-partitioned tables import with layout + partition values " +
    "(pruning works); non-identity transforms refuse") {
    val dir = icebergFixture("part", pcols = Seq("name"))(_ => ())
    val t = LakeTable.convert(spark, dir.toString)
    t.snapshot().metadata.partitionColumns shouldBe Seq("name")
    t.read().agg(sum("amount")).head().getDouble(0) shouldBe 60.0
    val full = t.snapshot().numFiles
    t.read(Seq(col("name") === "a")).inputFiles.length should be < full
    // rewrite the spec to a bucket transform: the import must refuse
    val dir2 = icebergFixture("part2", pcols = Seq("name"))(_ => ())
    val metaDir = dir2.resolve("metadata")
    val hint = new String(Files.readAllBytes(
      metaDir.resolve("version-hint.text"))).trim
    val mj = metaDir.resolve(s"v$hint.metadata.json")
    Files.write(mj, new String(Files.readAllBytes(mj))
      .replace("\"identity\"", "\"bucket[16]\"").getBytes)
    intercept[IllegalArgumentException] {
      LakeTable.convert(spark, dir2.toString)
    }.getMessage should include("identity")
  }

  test("format-version 1 imports (r13); future versions refuse; " +
    "manifest/footer record-count mismatch refuses") {
    val dir = icebergFixture("v1")(_ => ())
    val metaDir = dir.resolve("metadata")
    val hint = new String(Files.readAllBytes(
      metaDir.resolve("version-hint.text"))).trim
    val mj = metaDir.resolve(s"v$hint.metadata.json")
    val body = new String(Files.readAllBytes(mj))
    // an unknown FUTURE version refuses loudly
    Files.write(mj, body.replace("\"format-version\":2", "\"format-version\":3")
      .replace("\"format-version\" : 2", "\"format-version\" : 3").getBytes)
    intercept[IllegalArgumentException] {
      LakeTable.convert(spark, dir.toString)
    }.getMessage should include("format-version")
    // a v1 stamp imports: modern metadata keys still resolve, and the
    // missing-in-true-v1 avro fields read as their defaults either way
    // (the genuinely legacy-shaped v1 fixture lives in ForeignIcebergSpec)
    Files.write(mj, body.replace("\"format-version\":2", "\"format-version\":1")
      .replace("\"format-version\" : 2", "\"format-version\" : 1").getBytes)
    LakeTable.convert(spark, dir.toString).read().count() shouldBe 3
    graft.log.TxLog.deleteRecursively(dir.resolve("_txlog"))
    // restore, then tamper with a data file's row count (append a row by
    // rewriting): the manifest cross-check refuses
    Files.write(mj, body.getBytes)
    val dataFile =
      LakeTable.convert(spark, dir.toString).snapshot().files.head.path
    graft.log.TxLog.deleteRecursively(dir.resolve("_txlog"))
    val abs = dir.resolve(dataFile)
    val rows = spark.read.parquet(abs.toString)
    val staging = Files.createTempDirectory("iceberg-tamper")
    rows.unionAll(rows.limit(1)).coalesce(1)
      .write.mode("overwrite").parquet(staging.resolve("out").toString)
    val part = {
      val s = Files.list(staging.resolve("out"))
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.move(part, abs, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dropCrcSibling(abs)
    intercept[IllegalArgumentException] {
      LakeTable.convert(spark, dir.toString)
    }.getMessage should include("records")
  }

  /** Hadoop's checksummed LocalFileSystem leaves a `.<name>.crc` sidecar
    * for files Spark wrote; an in-place tamper must drop it or reads fail
    * on the stale checksum instead of exercising the importer's gates. */
  private def dropCrcSibling(p: Path): Unit =
    Files.deleteIfExists(p.getParent.resolve(s".${p.getFileName}.crc")): Unit

  /** Rewrite every live data file of a severed Iceberg fixture through a
    * plain Spark read (drops field-id metadata; preserves row order and
    * counts within each single file), applying `transform` — then sever
    * again. Simulates a FOREIGN writer's files. */
  private def rewriteDataFiles(dir: Path)(
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    val t0 = LakeTable.convert(spark, dir.toString)
    val files = t0.snapshot().files.map(_.path)
    graft.log.TxLog.deleteRecursively(dir.resolve("_txlog"))
    files.foreach { rel =>
      val abs = dir.resolve(rel)
      val read = transform(spark.read.parquet(abs.toString))
      // the parquet READER carries field ids back into schema metadata
      // (fieldId.read.enabled) and the writer would re-stamp them — strip
      // explicitly so the rewritten file is genuinely id-less
      val plainRows = read.select(read.columns.map(c =>
        col(c).as(c, org.apache.spark.sql.types.Metadata.empty)).toIndexedSeq: _*)
      val staging = Files.createTempDirectory("iceberg-strip")
      plainRows.coalesce(1).write.mode("overwrite")
        .parquet(staging.resolve("out").toString)
      val part = {
        val s = Files.list(staging.resolve("out"))
        try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
        finally s.close()
      }
      Files.move(part, abs, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dropCrcSibling(abs)
    }
  }

  test("id-less foreign files fall back to by-name binding; an unknown " +
    "footer column refuses") {
    val dir = icebergFixture("byname")(_ => ())
    rewriteDataFiles(dir)(identity) // plain read-write strips field ids
    val t = LakeTable.convert(spark, dir.toString)
    graft.log.ColumnIds.mapped(t.snapshot().schema) shouldBe false // by name
    t.read().agg(sum("amount")).head().getDouble(0) shouldBe 60.0
    // unknown physical column: refuse (name mapping we cannot resolve)
    val dir2 = icebergFixture("byname2")(_ => ())
    rewriteDataFiles(dir2)(_.withColumnRenamed("amount", "amt"))
    intercept[IllegalArgumentException] {
      LakeTable.convert(spark, dir2.toString)
    }.getMessage should include("amt")
  }
}
