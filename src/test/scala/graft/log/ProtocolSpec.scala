package graft.log

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.LakeTable

/** The protocol action's forward-compat contract: readers/writers refuse
  * tables demanding versions they don't implement — loudly, instead of
  * silently mis-reading features they don't understand (Delta's
  * minReaderVersion/minWriterVersion semantics). */
class ProtocolSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("id", LongType)))

  test("create stamps the current protocol; detail surfaces it") {
    val t = LakeTable.create(spark, tmpDir("proto").resolve("t").toString, schema)
    t.snapshot().protocol shouldBe Protocol.Current
    val d = t.detail().collect().head
    d.getAs[Int]("minReaderVersion") shouldBe Protocol.SupportedReader
    d.getAs[Int]("minWriterVersion") shouldBe Protocol.SupportedWriter
  }

  test("pre-protocol logs (no action) read as (1,1) and stay writable") {
    val t = LakeTable.create(spark, tmpDir("preproto").resolve("t").toString, schema)
    t.append(Seq(1L, 2L).toDF("id"))
    // strip the protocol line from every commit — an old-format table
    val logDir = t.dir.resolve("_txlog")
    val files = Files.list(logDir)
    try files.forEach { p =>
      if (p.getFileName.toString.endsWith(".json")) {
        val kept = Files.readAllLines(p, StandardCharsets.UTF_8)
        import scala.jdk.CollectionConverters._
        Files.write(p, kept.asScala.filterNot(_.contains("\"protocol\""))
          .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
      }
    } finally files.close()
    val t2 = LakeTable.forPath(spark, t.dir.toString)
    t2.snapshot().protocol shouldBe Protocol(1, 1)
    t2.append(Seq(3L).toDF("id"))
    t2.read().count() shouldBe 3
  }

  test("a higher minReaderVersion blocks reads with a clear error") {
    val t = LakeTable.create(spark, tmpDir("hir").resolve("t").toString, schema)
    t.upgradeProtocol(Protocol.SupportedReader + 1, Protocol.SupportedWriter + 1)
    val e = intercept[IllegalStateException] {
      LakeTable.forPath(spark, t.dir.toString).snapshot()
    }
    e.getMessage should include("minReaderVersion")
    e.getMessage should include("upgrade the library")
  }

  test("a higher minWriterVersion blocks writes but keeps reads working") {
    val t = LakeTable.create(spark, tmpDir("hiw").resolve("t").toString, schema)
    t.append(Seq(1L, 2L).toDF("id"))
    t.upgradeProtocol(Protocol.SupportedReader, Protocol.SupportedWriter + 1)
    val t2 = LakeTable.forPath(spark, t.dir.toString)
    t2.read().count() shouldBe 2 // reader version still supported
    val e = intercept[IllegalStateException] { t2.append(Seq(3L).toDF("id")) }
    e.getMessage should include("minWriterVersion")
    t2.read().count() shouldBe 2 // nothing half-committed
  }

  test("CLONE preserves the source's raised protocol instead of downgrading it") {
    val t = LakeTable.create(spark, tmpDir("clone-proto").resolve("t").toString, schema)
    t.append(Seq(1L, 2L).toDF("id"))
    t.upgradeProtocol(Protocol.SupportedReader, Protocol.SupportedWriter + 1)
    val c = t.cloneTo(tmpDir("clone-proto").resolve("c").toString, shallow = true)
    c.snapshot().protocol shouldBe
      Protocol(Protocol.SupportedReader, Protocol.SupportedWriter + 1)
    // the preserved gate still bites on the clone: reads fine, writes blocked
    c.read().count() shouldBe 2
    intercept[IllegalStateException] { c.append(Seq(3L).toDF("id")) }: Unit
  }

  test("writer gate is re-checked after a lost race (concurrent protocol upgrade)") {
    val dir = tmpDir("gate-race").resolve("t").toString
    val t = LakeTable.create(spark, dir, schema)
    t.append(Seq(1L).toDF("id"))
    // rival bound to the plain local store BEFORE the swap below
    val rival = LakeTable.forPath(spark, dir)
    var poisoned = false
    val interposer = new LogStore {
      def listFileNames(d: java.nio.file.Path): Seq[String] = LocalLogStore.listFileNames(d)
      def read(p: java.nio.file.Path): Seq[String] = LocalLogStore.read(p)
      def delete(p: java.nio.file.Path): Boolean = LocalLogStore.delete(p)
      def writeAtomic(p: java.nio.file.Path, b: Array[Byte], ow: Boolean): Boolean = {
        if (!ow && !poisoned) {
          poisoned = true
          // claim the version out from under the commit — with a protocol upgrade
          rival.upgradeProtocol(Protocol.SupportedReader, Protocol.SupportedWriter + 1): Unit
        }
        LocalLogStore.writeAtomic(p, b, ow)
      }
    }
    LogStore.default = interposer
    try {
      val t2 = LakeTable.forPath(spark, dir)
      // loses the CAS to the upgrade, re-resolves, and must re-gate: the
      // retry may not land a write into a now-upgraded table
      val e = intercept[IllegalStateException] { t2.append(Seq(2L).toDF("id")) }
      e.getMessage should include("minWriterVersion")
    } finally LogStore.default = LocalLogStore
    rival.read().count() shouldBe 1 // nothing half-committed
  }

  test("table features: supported ones work, unknown ones gate reads/writes loudly") {
    val t = LakeTable.create(spark, tmpDir("feat").resolve("t").toString, schema)
    t.append(Seq(1L, 2L).toDF("id"))
    // a feature this engine implements: everything keeps working
    t.addTableFeature("deletionVectors", readerAlso = true)
    t.append(Seq(3L).toDF("id"))
    t.read().count() shouldBe 3
    val det = t.detail().collect().head
    det.getAs[Seq[String]]("readerFeatures") shouldBe Seq("deletionVectors")
    det.getAs[Seq[String]]("writerFeatures") shouldBe Seq("deletionVectors")
    // an unknown WRITER feature: reads fine, writes refuse by NAME
    t.addTableFeature("futureWriterTrick")
    val t2 = LakeTable.forPath(spark, t.dir.toString)
    t2.read().count() shouldBe 3
    val ew = intercept[IllegalStateException] { t2.append(Seq(4L).toDF("id")) }
    ew.getMessage should include("futureWriterTrick")
    // an unknown READER feature: snapshot resolution refuses by NAME.
    // (write the protocol action directly — addTableFeature itself can no
    // longer commit into this table)
    val raw = new TxLog(t.dir)
    val cur = raw.snapshot().protocol
    raw.tryCommit(raw.latestVersion().get + 1, Seq(
      CommitInfo(raw.latestVersion().get + 1, System.currentTimeMillis(),
        "ADD FEATURE", Map.empty, Map.empty, raw.latestVersion().get),
      Protocol.merge(cur, Protocol(cur.minReaderVersion, cur.minWriterVersion,
        readerFeatures = Seq("futureReaderTrick"),
        writerFeatures = Seq("futureReaderTrick"))))) shouldBe true
    val er = intercept[IllegalStateException] {
      LakeTable.forPath(spark, t.dir.toString).snapshot()
    }
    er.getMessage should include("futureReaderTrick")
  }

  test("feature-requiring properties auto-stamp matching table features") {
    // CREATE with DV on: readers AND writers must declare deletionVectors
    val t = LakeTable.create(spark, tmpDir("auto-feat").resolve("t").toString, schema,
      properties = Map("graft.enableDeletionVectors" -> "true"))
    t.snapshot().protocol.readerSet shouldBe Set("deletionVectors")
    t.snapshot().protocol.writerSet shouldBe Set("deletionVectors")
    // SET TBLPROPERTIES turning CDF on adds the writer feature in-commit
    val t2 = LakeTable.create(spark, tmpDir("auto-feat2").resolve("t").toString, schema)
    t2.snapshot().protocol shouldBe Protocol.Current
    t2.setProperties(Map("delta.enableChangeDataFeed" -> "true"))
    t2.snapshot().protocol.writerSet shouldBe Set("changeDataFeed")
    t2.snapshot().protocol.readerSet shouldBe Set.empty
    // constraints imply checkConstraints; features only accumulate
    t2.addConstraint("pos", "id >= 0")
    t2.snapshot().protocol.writerSet shouldBe Set("changeDataFeed", "checkConstraints")
  }

  test("features survive checkpoints, accumulate on upgrade, and union on CLONE") {
    val t = LakeTable.create(spark, tmpDir("feat-ck").resolve("t").toString, schema,
      properties = Map("graft.checkpointInterval" -> "3"))
    t.addTableFeature("columnMapping", readerAlso = true)
    t.addTableFeature("checkConstraints")
    (1 to 4).foreach(i => t.append(Seq(i.toLong).toDF("id")))
    new TxLog(t.dir).listCheckpoints() should not be empty
    val p = LakeTable.forPath(spark, t.dir.toString).snapshot().protocol
    p.readerSet shouldBe Set("columnMapping")
    p.writerSet shouldBe Set("columnMapping", "checkConstraints")
    // an upgrade keeps the named features
    t.upgradeProtocol(Protocol.SupportedReader, Protocol.SupportedWriter)
    t.snapshot().protocol.writerSet shouldBe Set("columnMapping", "checkConstraints")
    // clone carries them (merge with the engine's current protocol)
    val c = t.cloneTo(tmpDir("feat-ck").resolve("c").toString, shallow = true)
    c.snapshot().protocol.writerSet shouldBe Set("columnMapping", "checkConstraints")
  }

  test("protocol can only move upward; upgrade survives checkpoints") {
    val t = LakeTable.create(spark, tmpDir("up").resolve("t").toString, schema,
      properties = Map("graft.checkpointInterval" -> "2"))
    intercept[IllegalArgumentException] { t.upgradeProtocol(0, 0) }
    t.upgradeProtocol(1, 1): Unit // no-op re-stamp is fine
    // drive past a checkpoint and confirm the action replays from it
    (1 to 4).foreach(i => t.append(Seq(i.toLong).toDF("id")))
    new TxLog(t.dir).listCheckpoints() should not be empty
    LakeTable.forPath(spark, t.dir.toString).snapshot().protocol shouldBe Protocol(1, 1)
  }
}
