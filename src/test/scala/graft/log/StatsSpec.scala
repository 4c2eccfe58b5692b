package graft.log

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {

  test("footer stats agree with the distributed one-pass collection on every type") {
    import spark.implicits._
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val longStr = "z" * 200
    val df = Seq(
      (1L, 10, 1.5f, 2.5, "alpha", true,
        java.sql.Date.valueOf("2024-01-01"), java.sql.Timestamp.valueOf("2024-01-01 10:30:00.123456"),
        new java.math.BigDecimal("100.50"), Seq(1, 2)),
      (2L, -3, -0.5f, 9.5, longStr, false,
        java.sql.Date.valueOf("2023-06-15"), java.sql.Timestamp.valueOf("2023-06-15 01:02:03.0"),
        new java.math.BigDecimal("-7.25"), Seq(3)),
      (3L, 99, 8.5f, -1.5, "omega", true,
        null, null, null, Seq.empty[Int])
    ).toDF("l", "i", "f", "d", "s", "b", "dt", "ts", "dec", "arr")
      .withColumn("dec", col("dec").cast("decimal(18,2)"))

    val dir = tmpDir("stats").resolve("p")
    df.write.parquet(dir.toString)
    val files = Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq

    val footer = Stats.fromFooters(files, df.schema)
    val dist = Stats.collect(spark.read.schema(df.schema).parquet(dir.toString))

    footer.keySet shouldBe dist.keySet
    footer.values.map(_._1).sum shouldBe 3L
    footer.foreach { case (path, (n, fstats)) =>
      val (dn, dstats) = dist(path)
      n shouldBe dn
      // every column the footer path reports must agree with the distributed pass
      fstats.foreach { case (colName, fs) =>
        val ds = dstats(colName)
        withClue(s"$colName min: ") { Option(fs.min) shouldBe Option(ds.min) }
        withClue(s"$colName max: ") { Option(fs.max) shouldBe Option(ds.max) }
        withClue(s"$colName nulls: ") { fs.nullCount shouldBe ds.nullCount }
      }
      // and it must report all prunable columns
      df.schema.fields.filter(f => Stats.isStatsType(f.dataType)).foreach { f =>
        withClue(s"missing footer stats for ${f.name}") {
          fstats.contains(f.name) shouldBe true
        }
      }
    }
  }

  test("a table write collects footer stats that actually prune (end-to-end)") {
    import spark.implicits._
    val t = graft.table.LakeTable.create(spark,
      tmpDir("stats-e2e").resolve("t").toString,
      Seq((1L, "a")).toDF("k", "v").schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    t.append(Seq((100L, "x"), (200L, "y")).toDF("k", "v").coalesce(1))
    val snap = t.snapshot()
    snap.files.foreach { f =>
      f.numRecords shouldBe 2
      f.stats("k").min should not be null
    }
    val kept = Pruner.prune(snap.files, Seq(col("k") === 150L), snap.schema)
    kept.size shouldBe 1 // only the 100..200 file can match
  }
}
