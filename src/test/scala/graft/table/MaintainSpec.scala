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
}
