package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Soundness + effectiveness of the driver-local partition pruning path
  * (min=max pseudo-stats with cast-canonicalized path-string values),
  * including typed (date/int) partition columns where the raw hive path
  * string must be normalized before comparing.
  */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val table: LakeTable = {
    val df = (0 until 300).map { i =>
      (i.toLong,
        java.sql.Date.valueOf(f"2024-0${i % 3 + 1}%d-15"),
        if (i % 5 == 0) "gold" else "std",
        i % 4)
    }.toDF("id", "day", "tier", "bucket")
    val t = LakeTable.create(spark, tmpDir("pp").resolve("t").toString, df.schema,
      partitionColumns = Seq("day", "tier", "bucket"))
    t.append(df)
    t
  }

  private val predicates: Seq[(String, Column)] = Seq(
    "date eq" -> (col("day") === java.sql.Date.valueOf("2024-02-15")),
    "date range" -> (col("day") > java.sql.Date.valueOf("2024-01-31")),
    "string eq" -> (col("tier") === "gold"),
    "int eq" -> (col("bucket") === 2),
    "int range" -> (col("bucket") >= 3),
    "in list" -> col("tier").isin("gold", "missing"),
    "conjunction" -> (col("tier") === "std" && col("bucket") < 2),
    "mixed with data col" -> (col("tier") === "gold" && col("id") > 200L),
    "no match" -> (col("bucket") === 99))

  test("partition-pruned reads equal full-scan-plus-filter") {
    val full = table.read()
    predicates.foreach { case (label, pred) =>
      withClue(s"[$label] ") {
        table.read(Seq(pred)).orderBy("id").collect() shouldBe
          full.filter(pred).orderBy("id").collect()
      }
    }
  }

  test("partition predicates actually cut the file list, without Spark jobs") {
    val snap = table.snapshot()
    // 3 days x 2 tiers x 4 buckets = 24 partition dirs
    snap.numFiles should be >= 24
    def kept(pred: Column): Int =
      table.partitionPrune(snap, snap.files, Seq(pred)).size
    kept(col("day") === java.sql.Date.valueOf("2024-02-15")) shouldBe snap.numFiles / 3
    kept(col("tier") === "gold") shouldBe snap.numFiles / 2
    kept(col("bucket") === 2) shouldBe snap.numFiles / 4
    kept(col("bucket") === 99) shouldBe 0
  }

  test("replaceWhere still uses exact partition matching") {
    val t2 = LakeTable.create(spark, tmpDir("pp2").resolve("t").toString,
      Seq((1L, "a")).toDF("id", "part").schema, partitionColumns = Seq("part"))
    t2.append(Seq((1L, "a"), (2L, "b")).toDF("id", "part"))
    t2.overwriteWhere(col("part") === "a", Seq((10L, "a")).toDF("id", "part"))
    t2.read().orderBy("id").as[(Long, String)].collect() shouldBe
      Array((2L, "b"), (10L, "a"))
  }
}
