package graft.migrate

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.LakeTable

/** Randomized Delta-log lifecycles vs a plain-Scala model: for ANY
  * add/remove sequence, any import/sync split point, any mix of
  * stats-bearing and stat-less adds, and percent-encoded names, the
  * imported table's live set, row count, and content must equal the
  * model's replay. A divergence here is silent data corruption in a
  * migration tool, so it gets the fuzz treatment. */
class DeltaImportFuzzSpec extends SparkSpec {

  private val mapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }
  private def j(v: Any): String = mapper.writeValueAsString(v)

  private val schema = StructType(Seq(StructField("id", LongType)))

  /** File k holds ids [k*10, k*10+10). Names exercise percent-encoding on
    * odd k (a space in the file name). */
  private def fileName(k: Int): String =
    if (k % 2 == 1) s"part $k.parquet" else s"part$k.parquet"
  private def encodedPath(k: Int): String =
    if (k % 2 == 1) s"part%20$k.parquet" else s"part$k.parquet"

  private def writeFile(dir: Path, k: Int): Unit = {
    val staging = Files.createTempDirectory("delta-fuzz-stage")
    spark.range(k * 10L, k * 10L + 10).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(staging.resolve("out").toString)
    val part = {
      val s = Files.list(staging.resolve("out"))
      try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.createDirectories(dir)
    Files.move(part, dir.resolve(fileName(k)))
    graft.log.TxLog.deleteRecursively(staging)
  }

  private def addLine(dir: Path, k: Int, withStats: Boolean): String = {
    val stats =
      if (!withStats) Map.empty[String, Any]
      else Map("stats" -> j(Map(
        "numRecords" -> 10,
        "minValues" -> Map("id" -> k * 10L),
        "maxValues" -> Map("id" -> (k * 10L + 9)),
        "nullCount" -> Map("id" -> 0))))
    j(Map("add" -> (Map(
      "path" -> encodedPath(k),
      "partitionValues" -> Map.empty,
      "size" -> Files.size(dir.resolve(fileName(k))),
      "modificationTime" -> 1700000000000L,
      "dataChange" -> true) ++ stats)))
  }

  private def removeLine(k: Int): String = j(Map("remove" -> Map(
    "path" -> encodedPath(k), "deletionTimestamp" -> 1700000001000L,
    "dataChange" -> true)))

  test("randomized add/remove logs with arbitrary sync split points match " +
    "the model's live set exactly") {
    val rnd = new scala.util.Random(20260816L)
    (0 until 4).foreach { trial =>
      val dir = tmpDir(s"delta-fuzz-$trial").resolve("t")
      val pool = 0 until 10
      pool.foreach(writeFile(dir, _))
      // model state + commit lines
      val live = scala.collection.mutable.LinkedHashSet.empty[Int]
      def randomCommit(): Seq[String] = {
        val n = 1 + rnd.nextInt(3)
        (0 until n).flatMap { _ =>
          if (live.nonEmpty && rnd.nextBoolean() && rnd.nextBoolean()) {
            val k = live.toSeq(rnd.nextInt(live.size))
            live.remove(k)
            Seq(removeLine(k))
          } else {
            val k = pool(rnd.nextInt(pool.size))
            live.add(k)
            Seq(addLine(dir, k, withStats = rnd.nextBoolean()))
          }
        }
      }
      val logDir = dir.resolve("_delta_log")
      Files.createDirectories(logDir)
      def commit(v: Long, lines: Seq[String]): Unit =
        Files.write(logDir.resolve(f"$v%020d.json"),
          lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
      val total = 4 + rnd.nextInt(5) // commits v0..total-1
      commit(0, Seq(
        j(Map("protocol" -> Map("minReaderVersion" -> 1, "minWriterVersion" -> 2))),
        j(Map("metaData" -> Map(
          "id" -> java.util.UUID.randomUUID().toString,
          "format" -> Map("provider" -> "parquet", "options" -> Map.empty),
          "schemaString" -> schema.json,
          "partitionColumns" -> Nil, "configuration" -> Map.empty,
          "createdTime" -> 1700000000000L)))) ++ randomCommit())
      val split = 1 + rnd.nextInt(total) // commits < split exist at import
      (1 until split).foreach(v => commit(v.toLong, randomCommit()))
      val liveAtImport = live.toSet

      val t = LakeTable.convert(spark, dir.toString)
      def check(expected: Set[Int], stage: String): Unit = {
        val snap = LakeTable.forPath(spark, dir.toString).snapshot()
        withClue(s"trial=$trial stage=$stage expected=$expected: ") {
          snap.files.map(_.path).toSet shouldBe expected.map(fileName)
          snap.files.map(_.numRecords).sum shouldBe expected.size * 10L
          val got = LakeTable.forPath(spark, dir.toString).read()
            .agg(coalesce(sum("id"), lit(0L))).head().getLong(0)
          got shouldBe expected.toSeq.map(k => (k * 10L until k * 10L + 10).sum).sum
        }
      }
      check(liveAtImport, "import")
      // the source keeps writing: the rest of the commits land, then sync
      (split until total).foreach(v => commit(v.toLong, randomCommit()))
      DeltaImport.sync(spark, dir.toString)
      check(live.toSet, "sync")
      // replayed sync is a no-op
      val v0 = LakeTable.forPath(spark, dir.toString).version
      DeltaImport.sync(spark, dir.toString) shouldBe v0
      check(live.toSet, "re-sync")
    }
  }
}
