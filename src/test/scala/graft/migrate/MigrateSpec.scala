package graft.migrate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable
import graft.ingest.BatchIngest

class MigrateSpec extends SparkSpec {

  test("full-table migration overwrites, adds metadata, and validates") {
    import spark.implicits._
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val t = LakeTable.create(spark, tmpDir("mig-full").resolve("t").toString, src.schema)
    val res = Migrate.fullTable(src, t, transform = _.filter(col("id") > 1))
    res.targetRows shouldBe 2
    res.validationPassed shouldBe true
    t.schema.fieldNames should contain("_record_hash")

    // re-run is idempotent (overwrite)
    Migrate.fullTable(src, t).targetRows shouldBe 3
  }

  test("incremental migration appends only rows past the watermark") {
    import spark.implicits._
    val src = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", "updated_at")
    val t = LakeTable.create(spark, tmpDir("mig-inc").resolve("t").toString,
      BatchIngest.withIngestionMetadata(src).schema)

    val (r1, w1) = Migrate.incremental(src, t, "updated_at", None)
    r1.sourceRows shouldBe 3
    r1.validationPassed shouldBe true
    w1 shouldBe Some("2024-01-03")

    // nothing new: empty batch, watermark unchanged
    val (r2, w2) = Migrate.incremental(src, t, "updated_at", w1)
    r2.sourceRows shouldBe 0
    w2 shouldBe Some("2024-01-03")

    // late-arriving newer row
    val more = Seq((4L, "2024-02-01")).toDF("id", "updated_at")
    val (r3, w3) = Migrate.incremental(src.union(more), t, "updated_at", w2)
    r3.sourceRows shouldBe 1
    w3 shouldBe Some("2024-02-01")
    t.read().count() shouldBe 4

    // recount mode reproduces the reference's physical before/after counts
    val later = Seq((5L, "2024-03-01")).toDF("id", "updated_at")
    val (r4, w4) = Migrate.incremental(src.union(later), t, "updated_at", w3,
      recount = true)
    r4.sourceRows shouldBe 1
    r4.targetRows shouldBe 5
    r4.validationPassed shouldBe true
    w4 shouldBe Some("2024-03-01")
  }

  test("incremental migration reads the source exactly once") {
    import spark.implicits._
    // every source-row evaluation bumps the accumulator via a
    // non-deterministic filter Catalyst can't elide or cache across scans
    val evals = spark.sparkContext.longAccumulator("src-evals")
    val touch = udf { () => evals.add(1); true }.asNondeterministic()
    val src = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", "updated_at")
    val t = LakeTable.create(spark, tmpDir("mig-once").resolve("t").toString,
      BatchIngest.withIngestionMetadata(src).schema)
    val (r, w) = Migrate.incremental(src, t, "updated_at", None,
      transform = _.filter(touch()))
    r.sourceRows shouldBe 3
    r.validationPassed shouldBe true
    w shouldBe Some("2024-01-03")
    // one pass = one evaluation per source row (the old shape did 3 passes)
    evals.value shouldBe 3L
  }

  test("multi-path consolidation unions by name with missing columns (U1)") {
    import spark.implicits._
    val d = tmpDir("mig-paths")
    Seq((1L, "a")).toDF("id", "v").write.json(d.resolve("p1").toString)
    Seq((2L, 9.5)).toDF("id", "score").write.json(d.resolve("p2").toString)
    val t = LakeTable.create(spark, d.resolve("t").toString,
      org.apache.spark.sql.types.StructType(Nil))
    val res = Migrate.consolidatePaths(spark, "json",
      Seq(d.resolve("p1").toString, d.resolve("p2").toString), t)
    res.targetRows shouldBe 2
    t.schema.fieldNames should contain allOf ("id", "v", "score")
  }

  test("catalog-table migration reads spark.table sources (S7)") {
    import spark.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").createOrReplaceTempView("legacy_tbl")
    val t = LakeTable.create(spark, tmpDir("mig-cat").resolve("t").toString,
      org.apache.spark.sql.types.StructType(Nil))
    Migrate.fromCatalogTable(spark, "legacy_tbl", t).targetRows shouldBe 2
  }
}
