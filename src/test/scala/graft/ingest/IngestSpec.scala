package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.LakeTable

class IngestSpec extends SparkSpec {

  test("format readers: parquet with schema enforcement, csv inference, json, orc (S1-S4)") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "score")
    val d = tmpDir("readers")
    df.write.parquet(d.resolve("p").toString)
    df.write.option("header", "true").csv(d.resolve("c").toString)
    df.write.json(d.resolve("j").toString)
    df.write.orc(d.resolve("o").toString)

    val schema = df.schema
    BatchIngest.parquet(spark, d.resolve("p").toString,
      BatchIngest.ReadConfig(schema = Some(schema))).collect().length shouldBe 2
    val csv = BatchIngest.csv(spark, d.resolve("c").toString)
    csv.schema("id").dataType shouldBe IntegerType // inferSchema picks int
    csv.count() shouldBe 2
    BatchIngest.format(spark, "json", d.resolve("j").toString,
      BatchIngest.ReadConfig(schema = Some(schema))).count() shouldBe 2
    BatchIngest.format(spark, "orc", d.resolve("o").toString).count() shouldBe 2
  }

  test("glob filter and recursive lookup reach the reader") {
    import spark.implicits._
    val d = tmpDir("glob")
    Seq(1L, 2L).toDF("id").write.parquet(d.resolve("nested/deep").toString)
    val got = BatchIngest.parquet(spark, d.toString,
      BatchIngest.ReadConfig(pathGlobFilter = Some("*.parquet"), recursive = true))
    got.count() shouldBe 2
  }

  test("jdbc url builder covers the four dialects; incremental subquery pushdown (S5/S6)") {
    BatchIngest.jdbcUrl("postgresql", "h", 5432, "db")._1 shouldBe "jdbc:postgresql://h:5432/db"
    BatchIngest.jdbcUrl("mysql", "h", 3306, "db")._1 should include("mysql")
    BatchIngest.jdbcUrl("sqlserver", "h", 1433, "db")._1 should include("databaseName=db")
    BatchIngest.jdbcUrl("oracle", "h", 1521, "db")._2 should include("oracle")
    an[IllegalArgumentException] should be thrownBy BatchIngest.jdbcUrl("db2", "h", 1, "d")
    BatchIngest.jdbcIncrementalTable("t", "updated_at", "2024-01-01") shouldBe
      "(SELECT * FROM t WHERE updated_at > '2024-01-01') AS incremental_data"
  }

  test("ingestion metadata columns: timestamp, date, source file, record hash") {
    import spark.implicits._
    val d = tmpDir("meta")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").write.parquet(d.resolve("p").toString)
    val got = BatchIngest.withIngestionMetadata(spark.read.parquet(d.resolve("p").toString))
    got.columns should contain allOf ("_ingestion_timestamp", "_ingestion_date",
      "_source_file", "_record_hash")
    got.filter(col("_source_file").contains(".parquet")).count() shouldBe 2
    // hash is over the original columns only: same row -> same hash
    got.select("_record_hash").distinct().count() shouldBe 2
  }

  test("optimal partition sizing heuristic (src/data_processor.py:294-300)") {
    BatchIngest.optimalPartitions(0) shouldBe 1
    BatchIngest.optimalPartitions(128L * 1024 * 1024 * 10) shouldBe 10
    BatchIngest.optimalPartitions(Long.MaxValue) shouldBe 10000
    BatchIngest.optimalPartitions(1, minPartitions = 8) shouldBe 8
  }

  test("ingestToTable lands data with metadata and evolved schema") {
    import spark.implicits._
    val d = tmpDir("ing")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.json(d.resolve("src").toString)
    val t = LakeTable.create(spark, d.resolve("tbl").toString,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
    BatchIngest.ingestToTable(spark, "json", d.resolve("src").toString, t,
      BatchIngest.ReadConfig(schema = Some(t.schema)))
    t.read().count() shouldBe 2
    t.schema.fieldNames should contain("_record_hash")
  }

  test("schema diff / ddl / merge / json-sample inference (§1.3)") {
    val a = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("x", StringType)))
    val b = StructType(Seq(StructField("id", LongType),
      StructField("y", DoubleType)))
    val diff = SchemaUtils.compareSchemas(a, b)
    diff.added.map(_.name) shouldBe Seq("y")
    diff.removed.map(_.name) shouldBe Seq("x")
    diff.changed shouldBe empty

    val ddl = SchemaUtils.schemaToDdl("t", a, Seq("id"))
    ddl should include("id BIGINT NOT NULL")
    ddl should include("PARTITIONED BY (id)")

    val merged = SchemaUtils.mergeSchemas(a, b)
    merged.fieldNames.toSeq shouldBe Seq("id", "x", "y")
    an[IllegalArgumentException] should be thrownBy SchemaUtils.mergeSchemas(
      StructType(Seq(StructField("id", LongType))),
      StructType(Seq(StructField("id", StringType))))

    SchemaUtils.schemaFromJsonSample(spark,
      Seq("""{"a": 1, "b": "x"}""", """{"a": 2, "c": 1.5}"""))
      .fieldNames.toSeq shouldBe Seq("a", "b", "c")
  }

  test("avro leg (S4): reads when spark-avro is present, clear error when absent") {
    import spark.implicits._
    if (BatchIngest.avroAvailable) {
      // round-trip through the datasource to prove the leg actually works
      val dir = tmpDir("avro").resolve("d").toString
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .write.format(BatchIngest.avroProvider.get).save(dir)
      val back = BatchIngest.format(spark, "avro", dir)
      back.count() shouldBe 2
      back.orderBy("id").collect().map(_.getString(1)) shouldBe Array("a", "b")
    } else {
      val e = intercept[IllegalStateException] {
        BatchIngest.format(spark, "avro", "/nonexistent")
      }
      e.getMessage should include("spark-avro")
    }
  }

  test("catalog: three-level names, create/read/list/drop (S7)") {
    import spark.implicits._
    val cat = Catalog(spark, tmpDir("cat").toString)
    val schema = StructType(Seq(StructField("id", LongType)))
    val t = cat.createTable("lake.bronze.events", schema)
    t.append(Seq(1L, 2L).toDF("id"))
    cat.tableExists("lake.bronze.events") shouldBe true
    cat.table("lake.bronze.events").read().count() shouldBe 2
    cat.createTable("lake.silver.events", schema)
    cat.listTables("lake") shouldBe Seq("lake.bronze.events", "lake.silver.events")
    cat.listTables("lake", Some("bronze")) shouldBe Seq("lake.bronze.events")
    cat.dropTable("lake.bronze.events") shouldBe true
    cat.tableExists("lake.bronze.events") shouldBe false
    an[IllegalArgumentException] should be thrownBy cat.table("no_dots")
  }
}
