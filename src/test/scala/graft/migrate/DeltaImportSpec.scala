package graft.migrate

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.LakeTable

/** Importing a Delta Lake `_delta_log` in place (fixtures are hand-crafted
  * to the public Delta protocol spec — the Delta library itself is not on
  * the classpath, deliberately). */
class DeltaImportSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }
  private def json(v: Any): String = mapper.writeValueAsString(v)

  /** Write `df` as ONE parquet file named `name` under `dir`. */
  private def dataFile(dir: Path, name: String, df: DataFrame): Unit = {
    val staging = Files.createTempDirectory("delta-import-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.resolve("out").toString)
    val part = {
      val s = Files.list(staging.resolve("out"))
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.createDirectories(dir)
    Files.move(part, dir.resolve(name))
    graft.log.TxLog.deleteRecursively(staging)
  }

  private def writeCommit(logDir: Path, v: Long, lines: Seq[String]): Unit = {
    Files.createDirectories(logDir)
    Files.write(logDir.resolve(f"$v%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def metaLine(pcols: Seq[String] = Nil,
      conf: Map[String, String] = Map.empty) = json(Map("metaData" -> Map(
    "id" -> "11111111-2222-3333-4444-555555555555",
    "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
    "schemaString" -> schema.json,
    "partitionColumns" -> pcols,
    "configuration" -> conf,
    "createdTime" -> 1700000000000L)))

  private def protoLine(reader: Int = 1, features: Seq[String] = null) =
    json(Map("protocol" -> (Map(
      "minReaderVersion" -> reader, "minWriterVersion" -> 2) ++
      Option(features).map("readerFeatures" -> _).toMap)))

  private def addLine(dir: Path, name: String, lo: Long, hi: Long,
      stats: Boolean = true, dv: Boolean = false,
      pv: Map[String, String] = Map.empty) = {
    val statsJson = json(Map(
      "numRecords" -> (hi - lo + 1),
      "minValues" -> Map("id" -> lo, "name" -> s"n$lo"),
      "maxValues" -> Map("id" -> hi, "name" -> s"n$hi"),
      "nullCount" -> Map("id" -> 0, "name" -> 0)))
    json(Map("add" -> (Map(
      "path" -> name,
      "partitionValues" -> pv,
      "size" -> (if (dir == null) 1000L else Files.size(dir.resolve(name))),
      "modificationTime" -> 1700000001000L,
      "dataChange" -> true) ++
      (if (stats) Map("stats" -> statsJson) else Map.empty) ++
      (if (dv) Map("deletionVector" -> Map(
        "storageType" -> "u", "pathOrInlineDv" -> "ab^-aqEH.-t@S}K{",
        "offset" -> 1, "sizeInBytes" -> 36, "cardinality" -> 2))
       else Map.empty))))
  }

  private def removeLine(name: String) = json(Map("remove" -> Map(
    "path" -> name, "deletionTimestamp" -> 1700000002000L, "dataChange" -> true)))

  private def rows(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi + 1).select(col("id"), concat(lit("n"), col("id")).as("name"))

  test("imports a JSON-only Delta log: live file set, schema, properties, " +
    "stats; graft DML works on the imported table") {
    val dir = tmpDir("delta-basic").resolve("t")
    dataFile(dir, "f0.parquet", rows(0, 4))
    dataFile(dir, "f1.parquet", rows(5, 9))
    dataFile(dir, "f2.parquet", rows(10, 14))
    val log = dir.resolve("_delta_log")
    writeCommit(log, 0, Seq(protoLine(), metaLine(conf = Map(
      "delta.deletedFileRetentionDuration" -> "interval 2 days")),
      addLine(dir, "f0.parquet", 0, 4), addLine(dir, "f1.parquet", 5, 9)))
    writeCommit(log, 1, Seq(
      addLine(dir, "f2.parquet", 10, 14), removeLine("f1.parquet")))

    val t = LakeTable.convert(spark, dir.toString) // auto-detects _delta_log
    t.read().count() shouldBe 10
    t.read().agg(sum("id")).head().getLong(0) shouldBe (0 to 4).sum + (10 to 14).sum
    t.snapshot().files.map(_.path).toSet shouldBe Set("f0.parquet", "f2.parquet")
    // delta.* properties carried over through prefix normalization
    t.properties.keys.exists(_.contains("deletedFileRetentionDuration")) shouldBe true
    // numeric bounds imported EXACTLY -> metadata-only min/max answers
    t.statsMinMax("id") shouldBe Some((0L, 14L))
    // string bounds are dropped (Delta truncation is not exactness-safe)
    t.statsMinMax("name") shouldBe None
    // history records the import
    val h = t.history(Some(1)).collect()(0)
    h.getString(3) shouldBe "CONVERT"
    h.getMap[String, String](4)("sourceFormat") shouldBe "delta"
    h.getMap[String, String](4)("sourceVersion") shouldBe "1"
    // the imported table is a full graft table: DML works
    t.delete(col("id") === 0L)
    t.read().count() shouldBe 9
    // idempotent: converting again returns the existing graft table
    LakeTable.convert(spark, dir.toString).version shouldBe t.version
  }

  test("replays a classic parquet checkpoint plus the JSON tail (pre-" +
    "checkpoint commits deleted, as Delta log retention leaves them)") {
    val dir = tmpDir("delta-cp").resolve("t")
    dataFile(dir, "f0.parquet", rows(0, 4))
    dataFile(dir, "f1.parquet", rows(5, 9))
    dataFile(dir, "f2.parquet", rows(10, 14))
    val log = dir.resolve("_delta_log")
    // checkpoint at v5 carrying protocol + metaData + adds f0, f1
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val cpSchema = StructType(Seq(
      StructField("add", addType), StructField("metaData", metaType),
      StructField("protocol", protoType)))
    def addRow(name: String, lo: Long, hi: Long) = Row(
      Row(name, Map.empty[String, String], Files.size(dir.resolve(name)),
        1700000001000L, true,
        json(Map("numRecords" -> (hi - lo + 1),
          "minValues" -> Map("id" -> lo), "maxValues" -> Map("id" -> hi),
          "nullCount" -> Map("id" -> 0, "name" -> 0)))),
      null, null)
    val cpRows = Seq(
      Row(null, Row("11111111-2222-3333-4444-555555555555", schema.json,
        Seq.empty[String], Map.empty[String, String]), null),
      Row(null, null, Row(1, 2)),
      addRow("f0.parquet", 0, 4), addRow("f1.parquet", 5, 9))
    val staging = Files.createTempDirectory("delta-cp-stage")
    spark.createDataFrame(cpRows.asJava, cpSchema).coalesce(1)
      .write.mode("overwrite").parquet(staging.resolve("out").toString)
    val part = {
      val s = Files.list(staging.resolve("out"))
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.createDirectories(log)
    Files.move(part, log.resolve(f"${5L}%020d.checkpoint.parquet"))
    graft.log.TxLog.deleteRecursively(staging)
    Files.write(log.resolve("_last_checkpoint"),
      """{"version":5,"size":4}""".getBytes(StandardCharsets.UTF_8))
    // the JSON tail: v6 swaps f1 for f2 (v0..v5 json deliberately absent)
    writeCommit(log, 6, Seq(
      addLine(dir, "f2.parquet", 10, 14), removeLine("f1.parquet")))

    val t = DeltaImport.convert(spark, dir.toString)
    t.read().count() shouldBe 10
    t.snapshot().files.map(_.path).toSet shouldBe Set("f0.parquet", "f2.parquet")
    t.statsMinMax("id") shouldBe Some((0L, 14L))
    val h = t.history(Some(1)).collect()(0)
    h.getMap[String, String](4)("sourceVersion") shouldBe "6"
  }

  test("refuses what it cannot faithfully import: partitioned tables, live " +
    "DVs, column mapping, unknown reader features, broken chains") {
    def fresh(tag: String, commit0: Seq[String], moreCommits: Seq[Seq[String]] = Nil): Path = {
      val dir = tmpDir(s"delta-refuse-$tag").resolve("t")
      dataFile(dir, "f0.parquet", rows(0, 4))
      writeCommit(dir.resolve("_delta_log"), 0, commit0)
      moreCommits.zipWithIndex.foreach { case (c, i) =>
        writeCommit(dir.resolve("_delta_log"), i + 1L, c)
      }
      dir
    }
    // partitioned
    val part = fresh("part", Seq(protoLine(),
      metaLine(pcols = Seq("name")), addLine(null, "f0.parquet", 0, 4, stats = false)))
    intercept[IllegalArgumentException] {
      DeltaImport.convert(spark, part.toString)
    }.getMessage should include("PARTITIONED")
    // live deletion vector
    val dv = fresh("dv", Seq(protoLine(reader = 3,
      features = Seq("deletionVectors")), metaLine()))
    writeCommit(dv.resolve("_delta_log"), 1,
      Seq(addLine(dv, "f0.parquet", 0, 4, dv = true)))
    intercept[IllegalArgumentException] {
      DeltaImport.convert(spark, dv.toString)
    }.getMessage should include("deletion vectors")
    // column mapping
    val cm = fresh("cm", Seq(protoLine(reader = 2),
      metaLine(conf = Map("delta.columnMapping.mode" -> "name")),
      addLine(null, "f0.parquet", 0, 4, stats = false)))
    intercept[IllegalArgumentException] {
      DeltaImport.convert(spark, cm.toString)
    }.getMessage should include("column mapping")
    // unknown reader feature
    val feat = fresh("feat", Seq(protoLine(reader = 3,
      features = Seq("futureMagic")), metaLine(),
      addLine(null, "f0.parquet", 0, 4, stats = false)))
    intercept[IllegalArgumentException] {
      DeltaImport.convert(spark, feat.toString)
    }.getMessage should include("futureMagic")
    // broken chain: no checkpoint and the log starts at v3
    val gap = tmpDir("delta-refuse-gap").resolve("t")
    dataFile(gap, "f0.parquet", rows(0, 4))
    writeCommit(gap.resolve("_delta_log"), 3, Seq(protoLine(), metaLine(),
      addLine(gap, "f0.parquet", 0, 4)))
    intercept[IllegalArgumentException] {
      DeltaImport.convert(spark, gap.toString)
    }.getMessage should include("broken Delta log chain")
  }

  test("incremental sync: new Delta commits apply as one net graft commit, " +
    "idempotently; schema changes and log gaps refuse") {
    val dir = tmpDir("delta-sync").resolve("t")
    dataFile(dir, "f0.parquet", rows(0, 4))
    dataFile(dir, "f1.parquet", rows(5, 9))
    dataFile(dir, "f2.parquet", rows(10, 14))
    val log = dir.resolve("_delta_log")
    writeCommit(log, 0, Seq(protoLine(), metaLine(),
      addLine(dir, "f0.parquet", 0, 4), addLine(dir, "f1.parquet", 5, 9)))
    writeCommit(log, 1, Seq(
      addLine(dir, "f2.parquet", 10, 14), removeLine("f1.parquet")))
    val t = LakeTable.convert(spark, dir.toString)
    t.properties(DeltaImport.SourceVersionKey) shouldBe "1"
    val v0 = t.version
    // nothing new: sync is a no-op
    DeltaImport.sync(spark, dir.toString) shouldBe v0
    // the Delta side keeps writing: v2 adds f3 + drops f0, v3 adds-and-
    // removes f4 within the range (must never materialize)
    dataFile(dir, "f3.parquet", rows(15, 19))
    dataFile(dir, "f4.parquet", rows(20, 24))
    writeCommit(log, 2, Seq(
      addLine(dir, "f3.parquet", 15, 19), removeLine("f0.parquet")))
    writeCommit(log, 3, Seq(addLine(dir, "f4.parquet", 20, 24)))
    writeCommit(log, 4, Seq(removeLine("f4.parquet")))
    DeltaImport.sync(spark, dir.toString)
    val t2 = LakeTable.forPath(spark, dir.toString)
    t2.snapshot().files.map(_.path).toSet shouldBe Set("f2.parquet", "f3.parquet")
    t2.read().agg(sum("id")).head().getLong(0) shouldBe (10L to 19L).sum
    t2.properties(DeltaImport.SourceVersionKey) shouldBe "4"
    val synced = t2.version
    // re-run: no-op (the consumed-version property gates it)
    DeltaImport.sync(spark, dir.toString) shouldBe synced
    // a TRANSIENT deletion vector inside the range (masked at v5, purged
    // by a rewrite at v6) nets out and must NOT block the sync
    dataFile(dir, "f5.parquet", rows(25, 29))
    writeCommit(log, 5, Seq(addLine(dir, "f4.parquet", 20, 24, dv = true)))
    writeCommit(log, 6, Seq(removeLine("f4.parquet"),
      addLine(dir, "f5.parquet", 25, 29)))
    DeltaImport.sync(spark, dir.toString)
    LakeTable.forPath(spark, dir.toString).snapshot().files.map(_.path).toSet shouldBe
      Set("f2.parquet", "f3.parquet", "f5.parquet")
    // a LIVE deletion vector at the end of the range refuses — and a later
    // purge commit makes the SAME sync succeed (the remedy works)
    writeCommit(log, 7, Seq(addLine(dir, "f4.parquet", 20, 24, dv = true)))
    intercept[IllegalArgumentException] {
      DeltaImport.sync(spark, dir.toString)
    }.getMessage should include("deletion vectors")
    writeCommit(log, 8, Seq(removeLine("f4.parquet")))
    DeltaImport.sync(spark, dir.toString) // v7's mask netted out by v8
    // a mid-stream schema change refuses (cut-over moment, not a sync)
    val otherSchema = StructType(Seq(StructField("id", LongType)))
    writeCommit(log, 9, Seq(json(Map("metaData" -> Map(
      "id" -> "11111111-2222-3333-4444-555555555555",
      "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
      "schemaString" -> otherSchema.json,
      "partitionColumns" -> Nil, "configuration" -> Map.empty,
      "createdTime" -> 1700000000000L)))))
    intercept[IllegalArgumentException] {
      DeltaImport.sync(spark, dir.toString)
    }.getMessage should include("schema")
    // a same-schema REPLACE that introduces partitioning refuses too
    Files.delete(log.resolve(f"${9L}%020d.json"))
    writeCommit(log, 9, Seq(metaLine(pcols = Seq("name"))))
    intercept[IllegalArgumentException] {
      DeltaImport.sync(spark, dir.toString)
    }.getMessage should include("repartitions")
    // a gap in the chain refuses with a re-import pointer
    Files.delete(log.resolve(f"${9L}%020d.json"))
    writeCommit(log, 11, Seq(addLine(dir, "f4.parquet", 20, 24)))
    intercept[IllegalArgumentException] {
      DeltaImport.sync(spark, dir.toString)
    }.getMessage should include("re-import")
    // and so does a checkpoint that advanced past the retained JSON tail
    (2L to 11L).foreach(v =>
      Files.deleteIfExists(log.resolve(f"$v%020d.json")): Unit)
    Files.write(log.resolve("_last_checkpoint"),
      """{"version":9,"size":1}""".getBytes(StandardCharsets.UTF_8))
    intercept[IllegalArgumentException] {
      DeltaImport.sync(spark, dir.toString)
    }.getMessage should include("re-import")
  }

  test("sync refuses after graft-side writes diverge (cut-over guard), but " +
    "file-set-neutral graft ops do not block it") {
    val dir = tmpDir("delta-diverge").resolve("t")
    dataFile(dir, "f0.parquet", rows(0, 4))
    dataFile(dir, "f1.parquet", rows(5, 9))
    val log = dir.resolve("_delta_log")
    writeCommit(log, 0, Seq(protoLine(), metaLine(),
      addLine(dir, "f0.parquet", 0, 4)))
    val t = LakeTable.convert(spark, dir.toString)
    // neutral graft ops (properties, vacuum) do not end the mirror
    t.setProperties(Map("graft.custom.note" -> "mirroring"))
    t.vacuum(retainHours = 1000.0)
    writeCommit(log, 1, Seq(addLine(dir, "f1.parquet", 5, 9)))
    DeltaImport.sync(spark, dir.toString)
    LakeTable.forPath(spark, dir.toString).read().count() shouldBe 10
    // graft-side DML is the cut-over: a later sync refuses LOUDLY instead
    // of silently re-landing rows the local write already rewrote
    val t2 = LakeTable.forPath(spark, dir.toString)
    t2.delete(col("id") === 0L)
    writeCommit(log, 2, Seq(removeLine("f0.parquet")))
    val err = intercept[IllegalArgumentException] {
      DeltaImport.sync(spark, dir.toString)
    }.getMessage
    err should include("cut-over")
    err should include("DELETE")
  }

  test("sync propagates Delta-side configuration changes, stamping implied " +
    "table features in the same commit") {
    val dir = tmpDir("delta-props").resolve("t")
    dataFile(dir, "f0.parquet", rows(0, 4))
    dataFile(dir, "f1.parquet", rows(5, 9))
    val log = dir.resolve("_delta_log")
    writeCommit(log, 0, Seq(protoLine(), metaLine(),
      addLine(dir, "f0.parquet", 0, 4)))
    val t = LakeTable.convert(spark, dir.toString)
    t.properties.get("graft.enableChangeDataFeed") shouldBe None
    // the Delta side enables CDF (a full metaData with new configuration)
    writeCommit(log, 1, Seq(
      metaLine(conf = Map("delta.enableChangeDataFeed" -> "true",
        "delta.deletedFileRetentionDuration" -> "interval 7 days")),
      addLine(dir, "f1.parquet", 5, 9)))
    DeltaImport.sync(spark, dir.toString)
    val t2 = LakeTable.forPath(spark, dir.toString)
    t2.properties.get("graft.enableChangeDataFeed") shouldBe Some("true")
    t2.properties.get("graft.deletedFileRetentionDuration") shouldBe
      Some("interval 7 days")
    // property-implies-feature rode the SAME commit
    t2.snapshot().protocol.writerSet should contain("changeDataFeed")
    t2.read().count() shouldBe 10
  }

  test("a Delta-side OPTIMIZE (dataChange=false file swap) syncs as a pure " +
    "metadata swap — no data re-materialization") {
    val dir = tmpDir("delta-optimize").resolve("t")
    dataFile(dir, "f0.parquet", rows(0, 4))
    dataFile(dir, "f1.parquet", rows(5, 9))
    val log = dir.resolve("_delta_log")
    writeCommit(log, 0, Seq(protoLine(), metaLine(),
      addLine(dir, "f0.parquet", 0, 4), addLine(dir, "f1.parquet", 5, 9)))
    val t = LakeTable.convert(spark, dir.toString)
    // the Delta side compacts: one dataChange=false commit swaps f0+f1 for
    // fc (their concatenation) — plus an ordinary append in the same range
    dataFile(dir, "fc.parquet", rows(0, 9))
    dataFile(dir, "f2.parquet", rows(10, 14))
    writeCommit(log, 1, Seq(
      json(Map("add" -> Map("path" -> "fc.parquet",
        "partitionValues" -> Map.empty,
        "size" -> Files.size(dir.resolve("fc.parquet")),
        "modificationTime" -> 1700000003000L, "dataChange" -> false,
        "stats" -> json(Map("numRecords" -> 10,
          "minValues" -> Map("id" -> 0), "maxValues" -> Map("id" -> 9),
          "nullCount" -> Map("id" -> 0, "name" -> 0)))))),
      json(Map("remove" -> Map("path" -> "f0.parquet",
        "deletionTimestamp" -> 1700000003000L, "dataChange" -> false))),
      json(Map("remove" -> Map("path" -> "f1.parquet",
        "deletionTimestamp" -> 1700000003000L, "dataChange" -> false)))))
    writeCommit(log, 2, Seq(addLine(dir, "f2.parquet", 10, 14)))
    DeltaImport.sync(spark, dir.toString)
    val t2 = LakeTable.forPath(spark, dir.toString)
    t2.snapshot().files.map(_.path).toSet shouldBe Set("fc.parquet", "f2.parquet")
    t2.read().agg(sum("id")).head().getLong(0) shouldBe (0L to 14L).sum
    // pure swap: the synced adds are the Delta files IN PLACE (no graft
    // data write), stats carried from the log (no footer re-read needed)
    t2.snapshot().files.find(_.path == "fc.parquet").get.numRecords shouldBe 10
    val h = t2.history(Some(1)).collect()(0)
    h.getString(3) shouldBe "DELTA SYNC"
    h.getMap[String, String](5)("numAddedFiles") shouldBe "2"
    h.getMap[String, String](5)("numRemovedFiles") shouldBe "2"
  }

  test("partitioned Delta tables rewrite-import: partition values re-inject " +
    "from the log into a natively partitioned graft table") {
    val src = tmpDir("delta-rewrite").resolve("src")
    // data files carry ONLY the data column (Delta never stores partition
    // columns in the files — they live in the log), so a correct import
    // must re-inject them from partitionValues
    dataFile(src, "f0.parquet", spark.range(0, 5).toDF("id"))
    dataFile(src, "f1.parquet", spark.range(5, 10).toDF("id"))
    dataFile(src, "f2.parquet", spark.range(10, 15).toDF("id"))
    val pSchema = StructType(Seq(
      StructField("id", LongType), StructField("p", StringType)))
    val log = src.resolve("_delta_log")
    writeCommit(log, 0, Seq(protoLine(),
      json(Map("metaData" -> Map(
        "id" -> "22222222-0000-1111-2222-333344445555",
        "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
        "schemaString" -> pSchema.json,
        "partitionColumns" -> Seq("p"), "configuration" -> Map.empty,
        "createdTime" -> 1700000000000L))),
      addLine(src, "f0.parquet", 0, 4, stats = false, pv = Map("p" -> "a")),
      addLine(src, "f1.parquet", 5, 9, stats = false, pv = Map("p" -> "b"))))
    writeCommit(log, 1, Seq(
      addLine(src, "f2.parquet", 10, 14, stats = false, pv = Map("p" -> "b")),
      removeLine("f1.parquet")))
    // in-place convert refuses and names the remedy
    val err = intercept[IllegalArgumentException] {
      DeltaImport.convert(spark, src.toString)
    }.getMessage
    err should include("PARTITIONED")
    err should include("convertRewrite")
    val dest = tmpDir("delta-rewrite").resolve("dest").toString
    val t = DeltaImport.convertRewrite(spark, src.toString, dest)
    t.snapshot().metadata.partitionColumns shouldBe Seq("p")
    t.read().count() shouldBe 10
    // partition values are the LOG's, per file
    t.read().groupBy("p").agg(count(lit(1)).as("n"), sum("id").as("s"))
      .orderBy("p").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq shouldBe Seq(("a", 5L, 10L), ("b", 5L, 60L))
    // the destination is a real partitioned graft table: pruning works
    val full = t.snapshot().numFiles
    t.read(Seq(col("p") === "a")).inputFiles.length should be < full
  }

  test("absolute add paths refuse: the data does not live under the table " +
    "root and must not resolve to wrong local files") {
    val dir = tmpDir("delta-abs").resolve("t")
    dataFile(dir, "f0.parquet", rows(0, 4))
    writeCommit(dir.resolve("_delta_log"), 0, Seq(protoLine(), metaLine(),
      json(Map("add" -> Map(
        "path" -> "s3://bucket/other/f.parquet",
        "partitionValues" -> Map.empty, "size" -> 1000L,
        "modificationTime" -> 1700000000000L, "dataChange" -> true)))))
    intercept[IllegalArgumentException] {
      DeltaImport.convert(spark, dir.toString)
    }.getMessage should include("absolute")
  }

  test("files without stats fall back to footer-derived stats (exact " +
    "bounds, correct record counts)") {
    val dir = tmpDir("delta-nostats").resolve("t")
    dataFile(dir, "f0.parquet", rows(0, 4))
    dataFile(dir, "f1.parquet", rows(5, 9))
    writeCommit(dir.resolve("_delta_log"), 0, Seq(protoLine(), metaLine(),
      addLine(dir, "f0.parquet", 0, 4, stats = false),
      addLine(dir, "f1.parquet", 5, 9, stats = false)))
    val t = DeltaImport.convert(spark, dir.toString)
    t.read().count() shouldBe 10
    t.snapshot().files.map(_.numRecords).sum shouldBe 10
    // footer stats are exact for longs -> metadata min/max answers
    t.statsMinMax("id") shouldBe Some((0L, 9L))
  }
}
