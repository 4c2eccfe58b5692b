package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable

/** Atomic CREATE OR REPLACE through the StagingTableCatalog: replace is ONE
  * engine commit that preserves history (time travel reaches the
  * pre-replace table), and a failed RTAS query leaves the old table
  * untouched. Also pins `spark.readStream.table` on catalog tables (the V1
  * fallback stream source). */
class CatalogReplaceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = tmpDir("graft-replace-wh").toString
  private def registerCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.grt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grt.warehouse", warehouse)
  }

  test("REPLACE TABLE AS SELECT is one history-preserving commit") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grt.ns")
    spark.sql("CREATE TABLE grt.ns.t (id BIGINT, v DOUBLE) USING graft")
    spark.range(10).select(col("id"), col("id").cast("double").as("v"))
      .write.mode("append").saveAsTable("grt.ns.t")
    val t = LakeTable.forPath(spark, s"$warehouse/ns/t")
    val beforeVersion = t.version

    spark.sql("""CREATE OR REPLACE TABLE grt.ns.t USING graft AS
      SELECT id AS key, concat('n', id) AS name FROM range(3)""")

    // new state, new schema
    spark.table("grt.ns.t").columns.toSeq shouldBe Seq("key", "name")
    spark.table("grt.ns.t").count() shouldBe 3
    // ONE commit on the SAME log — not a drop+create
    val t2 = LakeTable.forPath(spark, s"$warehouse/ns/t")
    t2.version shouldBe beforeVersion + 1
    t2.history(Some(1)).select("operation").as[String].head() shouldBe "REPLACE TABLE"
    // prior versions stay time-travelable with the OLD schema
    val old = t2.versionAsOf(beforeVersion)
    old.count() shouldBe 10
    old.columns.toSeq shouldBe Seq("id", "v")
  }

  test("plain CREATE OR REPLACE TABLE (no AS) swaps schema, keeps history") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grt.pl")
    spark.sql("CREATE TABLE grt.pl.t (id BIGINT) USING graft")
    spark.range(7).write.mode("append").saveAsTable("grt.pl.t")
    spark.sql("""CREATE OR REPLACE TABLE grt.pl.t (id BIGINT, day STRING)
      USING graft PARTITIONED BY (day) TBLPROPERTIES ('k' = 'v')""")
    spark.table("grt.pl.t").count() shouldBe 0
    val t = LakeTable.forPath(spark, s"$warehouse/pl/t")
    t.properties("k") shouldBe "v"
    t.snapshot().metadata.partitionColumns shouldBe Seq("day")
    t.versionAsOf(t.version - 1).count() shouldBe 7
    // the replaced table keeps working: partitioned insert round-trips
    Seq((1L, "d1"), (2L, "d2")).toDF("id", "day")
      .write.mode("append").saveAsTable("grt.pl.t")
    spark.sql("SELECT count(*) FROM grt.pl.t WHERE day = 'd1'")
      .collect().head.getLong(0) shouldBe 1
  }

  test("a failing RTAS query leaves the old table untouched") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grt.fl")
    spark.sql("CREATE TABLE grt.fl.t (id BIGINT) USING graft")
    spark.range(5).write.mode("append").saveAsTable("grt.fl.t")
    val before = LakeTable.forPath(spark, s"$warehouse/fl/t").version
    intercept[Exception] {
      spark.sql("""CREATE OR REPLACE TABLE grt.fl.t USING graft AS
        SELECT id, raise_error('boom') AS x FROM range(4)""")
    }
    val t = LakeTable.forPath(spark, s"$warehouse/fl/t")
    t.version shouldBe before // no commit landed
    spark.sql("REFRESH TABLE grt.fl.t")
    spark.table("grt.fl.t").count() shouldBe 5
  }

  test("RTAS data reads back column values (field-id-aligned files)") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grt.rd")
    spark.sql("CREATE TABLE grt.rd.t (id BIGINT) USING graft")
    spark.range(4).write.mode("append").saveAsTable("grt.rd.t")
    spark.sql("""CREATE OR REPLACE TABLE grt.rd.t USING graft AS
      SELECT id AS key, CAST(id * 2.5 AS DOUBLE) AS score FROM range(6)""")
    // real column IO, not metadata: the staged files must carry the stamped
    // field ids the committed (column-mapped) schema resolves by
    spark.table("grt.rd.t").agg(sum("score")).collect().head.getDouble(0) shouldBe
      (0 until 6).map(_ * 2.5).sum
    // and the replaced table's column mapping works: rename is metadata-only
    val t = LakeTable.forPath(spark, s"$warehouse/rd/t")
    t.renameColumn("score", "points")
    spark.sql("REFRESH TABLE grt.rd.t")
    spark.table("grt.rd.t").agg(sum("points")).collect().head.getDouble(0) shouldBe 37.5
  }

  test("a failing atomic CTAS leaves NO table behind") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grt.ct")
    intercept[Exception] {
      spark.sql("""CREATE TABLE grt.ct.boom USING graft AS
        SELECT id, raise_error('nope') AS x FROM range(3)""")
    }
    spark.sql("SHOW TABLES IN grt.ct").count() shouldBe 0
    // and the name is reusable right away
    spark.sql("CREATE TABLE grt.ct.boom (id BIGINT) USING graft")
    spark.table("grt.ct.boom").count() shouldBe 0
  }

  test("CDF ranges crossing a REPLACE TABLE fail with a clear boundary error") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grt.cdf")
    spark.sql("""CREATE TABLE grt.cdf.t (id BIGINT) USING graft
      TBLPROPERTIES ('graft.enableChangeDataFeed' = 'true')""")
    spark.range(5).write.mode("append").saveAsTable("grt.cdf.t")
    spark.sql("CREATE OR REPLACE TABLE grt.cdf.t USING graft AS SELECT id AS k FROM range(2)")
    val t = LakeTable.forPath(spark, s"$warehouse/cdf/t")
    val replaceV = t.version
    val err = intercept[IllegalStateException](t.changes(0).collect())
    err.getMessage should include("REPLACE TABLE")
    err.getMessage should include(s"version ${replaceV + 1}")
    // post-replace changes read fine
    spark.range(3).select(col("id").as("k")).write.mode("append").saveAsTable("grt.cdf.t")
    t.changes(replaceV + 1).count() shouldBe 3
    // a range ENTIRELY before the replace reads under the schema that
    // wrote it — old column name, old field ids, real values
    val pre = t.changes(0, Some(replaceV - 1))
    pre.columns should contain("id")
    pre.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq shouldBe (0L until 5L)
  }

  test("RESTORE across a REPLACE TABLE brings back schema AND properties") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grt.rs")
    spark.sql("""CREATE TABLE grt.rs.t (id BIGINT, v DOUBLE) USING graft
      TBLPROPERTIES ('mark' = 'original')""")
    spark.range(4).select(col("id"), col("id").cast("double").as("v"))
      .write.mode("append").saveAsTable("grt.rs.t")
    val t = LakeTable.forPath(spark, s"$warehouse/rs/t")
    val vOld = t.version
    spark.sql("""CREATE OR REPLACE TABLE grt.rs.t USING graft AS
      SELECT id AS a, id AS b, id AS c FROM range(2)""")
    t.restoreToVersion(vOld)
    spark.sql("REFRESH TABLE grt.rs.t")
    spark.table("grt.rs.t").columns.toSeq shouldBe Seq("id", "v")
    spark.table("grt.rs.t").count() shouldBe 4
    t.properties("mark") shouldBe "original"
    // the restored column-mapping counter matches the restored schema:
    // a fresh ADD COLUMN must get an UNUSED field id
    t.addColumns(Seq(org.apache.spark.sql.types.StructField(
      "extra", org.apache.spark.sql.types.StringType)))
    val ids = t.snapshot().schema.fields.toSeq.flatMap(graft.log.ColumnIds.idOf)
    ids.distinct.size shouldBe ids.size // no collisions
  }

  test("readStream.table streams a catalog table (V1 fallback source)") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grt.st")
    spark.sql("CREATE TABLE grt.st.src (id BIGINT) USING graft")
    spark.range(10).write.mode("append").saveAsTable("grt.st.src")
    val q = spark.readStream.table("grt.st.src")
      .writeStream.format("memory").queryName("replace_probe_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) shouldBe true
    finally if (q.isActive) q.stop()
    spark.table("replace_probe_sink").count() shouldBe 10
  }
}
