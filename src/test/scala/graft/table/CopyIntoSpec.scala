package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** COPY INTO: idempotent batch file loading (each source file loaded at
  * most once across invocations; the log is the only state). */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  test("copyInto loads each file at most once across invocations") {
    val src = tmpDir("copy-src")
    val t = LakeTable.create(spark, tmpDir("copy-tbl").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.parquet(src.resolve("f1").toString)
    t.copyInto(s"$src/*")
    t.read().count() shouldBe 2
    // full re-run: no-op, same version
    val v = t.version
    t.copyInto(s"$src/*") shouldBe v
    t.read().count() shouldBe 2
    // a new file arrives: only it loads (the f1 part files are in the ledger)
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.parquet(src.resolve("f2").toString)
    t.copyInto(s"$src/*")
    t.read().count() shouldBe 3
    t.read().select(sum("id")).as[Long].head() shouldBe 6L
    // SQL form
    Seq((4L, "d")).toDF("id", "v").coalesce(1)
      .write.parquet(src.resolve("f3").toString)
    GraftSql(spark).run(s"COPY INTO '${t.dir}' FROM '$src/*' FILEFORMAT = PARQUET")
    t.read().count() shouldBe 4
    // history records the loaded-file ledger per commit
    val ops = t.history().select("operation").as[String].collect()
    ops.count(_ == "COPY INTO") shouldBe 3
  }

  test("FORCE reloads past the ledger (the post-RESTORE escape hatch)") {
    val src = tmpDir("copy-force-src")
    val t = LakeTable.create(spark, tmpDir("copy-force-tbl").resolve("t").toString,
      StructType(Seq(StructField("id", LongType))))
    Seq(1L, 2L).toDF("id").coalesce(1).write.parquet(src.resolve("a").toString)
    t.copyInto(s"$src/*")
    t.read().count() shouldBe 2
    t.restoreToVersion(0)
    t.read().count() shouldBe 0
    // ledger survives the restore: a plain re-run is a no-op...
    val v = t.version
    t.copyInto(s"$src/*") shouldBe v
    t.read().count() shouldBe 0
    // ...FORCE reloads
    t.copyInto(s"$src/*", force = true)
    t.read().count() shouldBe 2
    // SQL spelling
    GraftSql(spark).run(s"COPY INTO '${t.dir}' FROM '$src/*' FILEFORMAT = PARQUET FORCE")
    t.read().count() shouldBe 4
  }

  test("copyInto rejects extra columns and computes missing generated columns") {
    val src = tmpDir("copy-gen-src")
    val t = LakeTable.create(spark, tmpDir("copy-gen-tbl").resolve("t").toString,
      StructType(Seq(
        StructField("id", LongType), StructField("ts", TimestampType),
        StructField("day", DateType))),
      properties = Map("graft.generated.day" -> "CAST(ts AS DATE)"))
    Seq((1L, java.sql.Timestamp.valueOf("2024-03-02 10:00:00")))
      .toDF("id", "ts").coalesce(1).write.parquet(src.resolve("a").toString)
    t.copyInto(s"$src/*")
    t.read().select("day").as[java.sql.Date].head().toString shouldBe "2024-03-02"
    Seq((2L, "x")).toDF("id", "extra").coalesce(1)
      .write.parquet(src.resolve("b").toString)
    an[IllegalArgumentException] should be thrownBy t.copyInto(s"$src/*")
  }
}
