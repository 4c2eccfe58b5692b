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
