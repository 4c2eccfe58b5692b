package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.LakeTable

class StreamingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("event_type", StringType)))

  private def writeJson(dir: Path, name: String, rows: Seq[(Long, String)]): Unit = {
    val body = rows.map { case (i, t) => s"""{"id":$i,"event_type":"$t"}""" }
      .mkString("", "\n", "\n")
    Files.write(dir.resolve(name), body.getBytes(StandardCharsets.UTF_8))
  }

  test("dedup-at-ingest: index-filtered batches, cross-batch dedup, replay no-op") {
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val src = tmpDir("dedup-src")
    val ck = tmpDir("dedup-ck").toString
    val corpus = LakeTable.create(spark, tmpDir("dedup-corpus").resolve("t").toString, docSchema)
    import spark.implicits._
    val index = LakeTable.createFrom(spark, tmpDir("dedup-idx").resolve("t").toString,
      graft.dedup.Dedup.fingerprints(Seq((100L, "already ingested")).toDF("doc_id", "text")))
    def writeDocs(name: String, rows: Seq[(Long, String)]): Unit =
      Files.write(src.resolve(name),
        rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
          .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    def drain(): Unit = {
      val cfg = StreamIngest.StreamConfig(
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = StreamIngest.startDedupIngest(
        StreamIngest.fileSource(spark, src.toString, docSchema, cfg),
        corpus, index, ck, config = cfg)
      try { require(q.awaitTermination(120000), "stream did not drain") }
      finally if (q.isActive) q.stop()
    }
    // batch 1: one corpus hit dropped, one within-batch dup collapsed
    writeDocs("b1.json", Seq((1L, "already ingested"), (2L, "fresh alpha"),
      (5L, "fresh alpha"), (3L, "fresh beta")))
    drain()
    corpus.read().select("doc_id").as[Long].collect().sorted shouldBe Array(2L, 3L)
    // batch 2: dup of batch-1 survivor dropped via the UPDATED index
    writeDocs("b2.json", Seq((7L, "fresh alpha"), (8L, "fresh gamma")))
    drain()
    corpus.read().select("doc_id").as[Long].collect().sorted shouldBe Array(2L, 3L, 8L)
    // index carries exactly the pre-load + survivors
    index.read().count() shouldBe 4 // 100, 2, 3, 8
    // replay with no new files: both ledgers make it a no-op
    drain()
    corpus.read().count() shouldBe 3
    index.read().count() shouldBe 4
  }

  test("bm25-index-at-ingest: postings+stats advance per batch exactly once, " +
    "replayed epochs no-op, search matches the direct scan") {
    import graft.text.TextAnalysis
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val src = tmpDir("bm25ing-src")
    val ckDir = tmpDir("bm25ing-ck")
    val ck = ckDir.toString
    val corpus = LakeTable.create(spark,
      tmpDir("bm25ing-corpus").resolve("t").toString, docSchema)
    import spark.implicits._
    val seed = Seq((100L, "seed alpha gamma")).toDF("doc_id", "text")
    val index = TextAnalysis.buildBm25Index(spark,
      tmpDir("bm25ing-idx").resolve("t").toString, seed, buckets = 8)
    def writeDocs(name: String, rows: Seq[(Long, String)]): Unit =
      Files.write(src.resolve(name),
        rows.map { case (i, t) => s"""{"doc_id":$i,"text":"$t"}""" }
          .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    def drain(): Unit = {
      val cfg = StreamIngest.StreamConfig(
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = StreamIngest.startBm25Ingest(
        StreamIngest.fileSource(spark, src.toString, docSchema, cfg),
        corpus, index, ck, config = cfg)
      try { require(q.awaitTermination(120000), "stream did not drain") }
      finally if (q.isActive) q.stop()
    }
    writeDocs("b1.json", Seq((1L, "alpha beta"), (2L, "beta gamma delta")))
    drain()
    corpus.read().count() shouldBe 2
    index.properties("graft.bm25.numDocs").toLong shouldBe 3L // seed + 2
    index.properties("graft.bm25.totalLen").toLong shouldBe 3L + 2L + 3L
    // second batch through the same checkpoint
    writeDocs("b2.json", Seq((3L, "delta epsilon")))
    drain()
    corpus.read().count() shouldBe 3
    index.properties("graft.bm25.numDocs").toLong shouldBe 4L
    index.properties("graft.bm25.totalLen").toLong shouldBe 10L
    // drain with no new files: a no-op on both tables
    drain()
    corpus.read().count() shouldBe 3
    index.properties("graft.bm25.numDocs").toLong shouldBe 4L
    // the crash-replay twin: re-running epoch 0's index append under the
    // checkpoint's real (txnAppId, epochId) must be a FULL no-op — the
    // sink committed but the offset write was lost, Spark replays
    val appId = new String(Files.readAllBytes(
      ckDir.resolve("_graft_txn_app_id")), StandardCharsets.UTF_8).trim
    val rowsBefore = index.toDf.count()
    TextAnalysis.appendBm25Batch(index,
      Seq((1L, "alpha beta"), (2L, "beta gamma delta")).toDF("doc_id", "text"),
      batchId = Some(s"$appId-index"), batchVersion = 0L)
    index.toDf.count() shouldBe rowsBefore
    index.properties("graft.bm25.numDocs").toLong shouldBe 4L
    // search over the streamed index == direct bm25TopK over the union
    val queries = Seq((900L, "beta delta"), (901L, "alpha epsilon"))
      .toDF("doc_id", "text")
    val viaIndex = TextAnalysis.bm25SearchIndex(index, queries, k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val direct = TextAnalysis.bm25TopK(seed.union(corpus.read()), queries, k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    viaIndex shouldBe direct
  }

  test("file stream ingests into a table exactly-once across restarts (S11+W7)") {
    val src = tmpDir("stream-src")
    val ck = tmpDir("stream-ck").toString
    val table = LakeTable.create(spark, tmpDir("stream-tbl").resolve("t").toString, schema)

    writeJson(src, "a.json", Seq((1L, "view"), (2L, "click")))
    val q1 = StreamIngest.ingest(spark, src.toString, schema, table, ck)
    q1.processAllAvailable()
    q1.stop()
    table.read().count() shouldBe 2

    // restart from the same checkpoint with new files: no reprocessing of a.json
    writeJson(src, "b.json", Seq((3L, "view")))
    val q2 = StreamIngest.ingest(spark, src.toString, schema, table, ck)
    q2.processAllAvailable()
    q2.stop()
    table.read().count() shouldBe 3
    table.read().select(sum("id")).collect().head.getLong(0) shouldBe 6L
  }

  test("restart-based schema evolution: a new column lands as nullable (addNewColumns parity)") {
    val src = tmpDir("evo-src")
    val ck = tmpDir("evo-ck").toString
    val schemaLoc = tmpDir("evo-schema").toString

    writeJson(src, "a.json", Seq((1L, "view"), (2L, "click")))
    val s1 = StreamIngest.inferOrLoadSchema(spark, src.toString, "json", schemaLoc, evolve = true)
    val table = LakeTable.create(spark, tmpDir("evo-tbl").resolve("t").toString, s1)
    val cfg = StreamIngest.StreamConfig(mergeSchema = true)
    val q1 = StreamIngest.ingest(spark, src.toString, s1, table, ck, cfg)
    q1.processAllAvailable()
    q1.stop()
    table.schema.fieldNames should not contain "score"

    // a new column appears in newly arriving files; the restart re-infers,
    // unions it into the schema location, and the sink table evolves
    Files.write(src.resolve("b.json"),
      """{"id":3,"event_type":"buy","score":9.5}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val s2 = StreamIngest.inferOrLoadSchema(spark, src.toString, "json", schemaLoc, evolve = true)
    s2.fieldNames should contain("score")
    val q2 = StreamIngest.ingest(spark, src.toString, s2, table, ck, cfg)
    q2.processAllAvailable()
    q2.stop()

    table.schema.fieldNames should contain("score")
    table.read().count() shouldBe 3
    // pre-evolution rows read as null, the new row carries its value
    table.read().filter(col("score").isNull).count() shouldBe 2
    table.read().filter(col("id") === 3L).select("score")
      .collect().head.getDouble(0) shouldBe 9.5
  }

  test("streaming CDC upsert: latest-per-key merge with deletes, exactly-once replay") {
    val src = tmpDir("upsert-src")
    val ck = tmpDir("upsert-ck").toString
    val cdcSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("seq", LongType), StructField("_deleted", BooleanType)))
    def writeCdc(name: String, rows: Seq[(Long, String, Long, Boolean)]): Unit = {
      val body = rows.map { case (i, v, s, d) =>
        s"""{"id":$i,"v":"$v","seq":$s,"_deleted":$d}""" }.mkString("", "\n", "\n")
      Files.write(src.resolve(name), body.getBytes(StandardCharsets.UTF_8))
    }
    val table = LakeTable.create(spark,
      tmpDir("upsert-tbl").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType),
        StructField("seq", LongType))))

    // batch 1: inserts, incl. two versions of id=2 (seq decides the winner)
    writeCdc("a.json", Seq((1L, "a1", 1L, false), (2L, "b1", 1L, false),
      (2L, "b2", 2L, false), (3L, "c1", 1L, false)))
    val source = StreamIngest.fileSource(spark, src.toString, cdcSchema,
      StreamIngest.StreamConfig(format = "json"))
    val q1 = StreamIngest.startUpsertStream(source, table, ck,
      keyCols = Seq("id"), sequenceCol = Some("seq"), deleteCol = Some("_deleted"))
    q1.processAllAvailable()
    q1.stop()
    table.read().count() shouldBe 3
    table.read().filter(col("id") === 2L).select("v")
      .collect().head.getString(0) shouldBe "b2"

    // batch 2 on a restarted query: update id=1, delete id=3, insert id=4,
    // and a delete for a key never seen (no-op insert suppression)
    writeCdc("b.json", Seq((1L, "a2", 2L, false), (3L, "gone", 2L, true),
      (4L, "d1", 1L, false), (9L, "ghost", 1L, true)))
    val q2 = StreamIngest.startUpsertStream(
      StreamIngest.fileSource(spark, src.toString, cdcSchema,
        StreamIngest.StreamConfig(format = "json")),
      table, ck, keyCols = Seq("id"), sequenceCol = Some("seq"),
      deleteCol = Some("_deleted"))
    q2.processAllAvailable()
    q2.stop()
    val out = table.read().orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    out shouldBe Array((1L, "a2"), (2L, "b2"), (4L, "d1"))
  }

  test("CHECK constraints hold on the streaming sink (pre-pass validation, no Observation)") {
    val src = tmpDir("ck-src")
    val ck = tmpDir("ck-ck").toString
    val table = LakeTable.create(spark, tmpDir("ck-tbl").resolve("t").toString, schema)
    table.addConstraint("id_positive", "id > 0")
    writeJson(src, "good.json", Seq((1L, "view"), (2L, "click")))
    val q1 = StreamIngest.ingest(spark, src.toString, schema, table, ck)
    q1.processAllAvailable()
    q1.stop()
    table.read().count() shouldBe 2
    // a violating batch fails the stream and commits nothing
    writeJson(src, "bad.json", Seq((-5L, "view")))
    val q2 = StreamIngest.ingest(spark, src.toString, schema, table, ck)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    ex.getMessage should include regex "(?i)constraint"
    table.read().count() shouldBe 2
  }

  test("DML metrics inside foreachBatch: update/delete recount instead of observing") {
    import spark.implicits._
    val src = tmpDir("dmlfb-src")
    val ck = tmpDir("dmlfb-ck").toString
    val table = LakeTable.createFrom(spark,
      tmpDir("dmlfb-tbl").resolve("t").toString,
      (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    // drive UPDATE + DELETE from inside a foreachBatch closure — the
    // stream-thread fallback path (Observation would deadlock here)
    writeJson(src, "trigger.json", Seq((100L, "go")))
    val q = StreamIngest.fileSource(spark, src.toString, schema).writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        table.update(col("id") <= 5L, Map("v" -> lit("updated"))): Unit
        table.delete(col("id") > 18L): Unit
      }.start()
    q.processAllAvailable()
    q.stop()
    table.read().filter(col("v") === "updated").count() shouldBe 5
    table.read().count() shouldBe 18
    val metrics = table.history().select("operation", "operationMetrics")
      .collect().map(r => r.getString(0) -> r.getMap[String, String](1)).toMap
    metrics("UPDATE").get("numUpdatedRows") shouldBe Some("5")
    metrics("DELETE").get("numDeletedRows") shouldBe Some("2")
  }

  test("merge withTxn: a replayed (appId, version) epoch is a no-op") {
    import spark.implicits._
    val table = LakeTable.createFrom(spark,
      tmpDir("txn-merge").resolve("t").toString,
      Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    def mergeOnce(): Long =
      table.merge(Seq((2L, "y2"), (3L, "z")).toDF("id", "v"),
          col("target.id") === col("source.id"))
        .withTxn("app-1", 5L)
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val v1 = mergeOnce()
    table.read().count() shouldBe 3
    // replay: same app id + version -> no new commit, no double-apply
    mergeOnce() shouldBe v1
    table.version shouldBe v1
    table.read().filter(col("id") === 2L).select("v")
      .collect().head.getString(0) shouldBe "y2"
    // the next epoch applies normally
    table.merge(Seq((4L, "w")).toDF("id", "v"),
        col("target.id") === col("source.id"))
      .withTxn("app-1", 6L)
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    table.read().count() shouldBe 4
  }

  test("autoCompact keeps streaming-sink file counts bounded over many micro-batches") {
    val src = tmpDir("compact-src")
    val ck = tmpDir("compact-ck").toString
    val table = LakeTable.create(spark, tmpDir("compact-tbl").resolve("t").toString, schema)
    // trigger compaction once 6 small files accumulate (default 50 is sized
    // for production file counts, not a unit test)
    table.setProperties(Map(
      "graft.autoOptimize.autoCompact" -> "true",
      "graft.autoOptimize.optimizeWrite" -> "true",
      "graft.autoCompact.minNumFiles" -> "6"))

    // one file per trigger -> one commit per micro-batch, 18 batches
    val cfg = StreamIngest.StreamConfig(maxFilesPerTrigger = 1)
    (0 until 18).foreach { b =>
      writeJson(src, f"b$b%03d.json", Seq((b * 2L, "view"), (b * 2L + 1, "click")))
    }
    val q = StreamIngest.ingest(spark, src.toString, schema, table, ck, cfg)
    q.processAllAvailable()
    q.stop()

    table.read().count() shouldBe 36
    table.read().select(sum("id")).collect().head.getLong(0) shouldBe (0L until 36L).sum
    // without compaction this table would hold >= 18 files (one per batch);
    // auto-compact bin-packs once the small-file count passes the threshold
    val files = table.snapshot().numFiles
    withClue(s"files after 18 micro-batches: $files") {
      files should be < 10
    }
    table.history().select("operation").as[String](
      org.apache.spark.sql.Encoders.STRING).collect() should contain("OPTIMIZE")
  }

  test("replayed epoch is a no-op (idempotent appendStream)") {
    val table = LakeTable.create(spark, tmpDir("replay-tbl").resolve("t").toString, schema)
    import spark.implicits._
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "event_type")
    table.appendStream(batch, "app-1", 0L)
    val vAfter = table.appendStream(batch, "app-1", 0L) // replay of epoch 0
    table.read().count() shouldBe 2
    vAfter shouldBe table.version
    table.appendStream(batch, "app-1", 1L) // next epoch appends
    table.read().count() shouldBe 4
    // a different app id has its own epoch sequence
    table.appendStream(batch, "app-2", 0L)
    table.read().count() shouldBe 6
  }

  test("maxFilesPerTrigger rate-limits discovery into multiple commits") {
    val src = tmpDir("rate-src")
    val ck = tmpDir("rate-ck").toString
    val table = LakeTable.create(spark, tmpDir("rate-tbl").resolve("t").toString, schema)
    (0 until 4).foreach(i => writeJson(src, s"f$i.json", Seq((i.toLong, "e"))))
    val q = StreamIngest.ingest(spark, src.toString, schema, table, ck,
      StreamIngest.StreamConfig(maxFilesPerTrigger = 1))
    q.processAllAvailable()
    q.stop()
    table.read().count() shouldBe 4
    val streamCommits = table.snapshot().commits.count(_.operation == "STREAMING UPDATE")
    streamCommits should be >= 4
  }

  test("per-batch transform hook cleans rows before the sink") {
    val src = tmpDir("tr-src")
    val ck = tmpDir("tr-ck").toString
    val table = LakeTable.create(spark, tmpDir("tr-tbl").resolve("t").toString, schema)
    writeJson(src, "a.json", Seq((1L, "view"), (2L, "bad"), (3L, "click")))
    val q = StreamIngest.ingest(spark, src.toString, schema, table, ck,
      transform = _.filter(col("event_type") =!= "bad"))
    q.processAllAvailable()
    q.stop()
    table.read().count() shouldBe 2
  }

  test("schema location: inferred once, stable across restarts (S11 parity)") {
    val src = tmpDir("schema-src")
    val loc = tmpDir("schema-loc").toString
    writeJson(src, "a.json", Seq((1L, "view")))
    val s1 = StreamIngest.inferOrLoadSchema(spark, src.toString, "json", loc)
    s1.fieldNames.toSet shouldBe Set("id", "event_type")
    // new files with MORE fields do not change the persisted schema
    Files.write(src.resolve("b.json"),
      """{"id":2,"event_type":"x","extra":true}""".getBytes(StandardCharsets.UTF_8))
    val s2 = StreamIngest.inferOrLoadSchema(spark, src.toString, "json", loc)
    s2 shouldBe s1
    // and the persisted schema drives an ingest end-to-end
    val table = LakeTable.create(spark, tmpDir("schema-tbl").resolve("t").toString, s2)
    val q = StreamIngest.ingest(spark, src.toString, s2, table, tmpDir("schema-ck").toString)
    q.processAllAvailable(); q.stop()
    table.read().count() shouldBe 2
  }

  test("ChangeFeed processes CDF incrementally with a version checkpoint") {
    import spark.implicits._
    val table = LakeTable.create(spark, tmpDir("cf-tbl").resolve("t").toString, schema)
    val ck = tmpDir("cf-ck").resolve("v.txt").toString
    val feed = new ChangeFeed(table, ck)

    table.append(Seq((1L, "a"), (2L, "b")).toDF("id", "event_type"))
    var seen = 0L
    feed.processOnce(df => seen = df.filter(col("_change_type") === "insert").count())
    seen shouldBe 2
    feed.lastProcessedVersion shouldBe Some(table.version)

    // caught up: nothing pending
    feed.processOnce(_ => fail("handler must not run when caught up")) shouldBe 0

    // new commit -> only its changes are handed over
    table.append(Seq((3L, "c")).toDF("id", "event_type"))
    feed.processOnce(df => seen = df.count())
    seen shouldBe 1
    feed.lastProcessedVersion shouldBe Some(table.version)
  }
}
