package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CONVERT-in-place: an existing plain-parquet directory becomes a graft
  * table through one metadata-only commit — no data rewrite. */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  test("convert registers existing parquet files without rewriting them") {
    val dir = tmpDir("conv").resolve("t").toString
    val df = spark.range(500).select(col("id"), (col("id") % 9).cast("double").as("v"))
    df.repartition(4).write.parquet(dir)
    val filesBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap

    val t = LakeTable.convert(spark, dir)
    t.read().count() shouldBe 500
    t.read().agg(sum("id")).head().getLong(0) shouldBe (0L until 500L).sum
    t.snapshot().numFiles shouldBe filesBefore.size
    // zero-copy: same files, untouched
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    after shouldBe filesBefore
    // footer stats landed -> pruning works immediately
    val hit = t.toDf.filter(col("id") === 5L)
    hit.count() shouldBe 1
    t.history(None).filter(col("operation") === "CONVERT").count() shouldBe 1
  }

  test("converted tables are full tables: DML, time travel, maintenance") {
    val dir = tmpDir("convdml").resolve("t").toString
    spark.range(300).select(col("id"), lit("x").as("s")).coalesce(2).write.parquet(dir)
    val t = LakeTable.convert(spark, dir)
    val v0 = t.version
    t.delete(col("id") < 100L)
    t.read().count() shouldBe 200
    t.append(Seq((1000L, "new")).toDF("id", "s"))
    t.read().count() shouldBe 201
    t.versionAsOf(v0).count() shouldBe 300
    t.optimizeCompact()
    t.read().count() shouldBe 201
  }

  test("convert is idempotent and rejects hive-partitioned layouts") {
    val dir = tmpDir("convid").resolve("t").toString
    spark.range(10).toDF("id").write.parquet(dir)
    val t1 = LakeTable.convert(spark, dir)
    val t2 = LakeTable.convert(spark, dir)
    t2.version shouldBe t1.version

    val hdir = tmpDir("convhive").resolve("t").toString
    spark.range(10).select(col("id"), (col("id") % 2).as("p"))
      .write.partitionBy("p").parquet(hdir)
    an[IllegalArgumentException] should be thrownBy LakeTable.convert(spark, hdir)
  }

  test("CONVERT TO GRAFT SQL command") {
    val dir = tmpDir("convsql").resolve("t").toString
    spark.range(50).toDF("id").write.parquet(dir)
    val out = GraftSql(spark).run(s"CONVERT TO GRAFT parquet.`$dir`").collect().head
    out.getString(0) shouldBe dir
    LakeTable.forPath(spark, dir).read().count() shouldBe 50
  }
}
