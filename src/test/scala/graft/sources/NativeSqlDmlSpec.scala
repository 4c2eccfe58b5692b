package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable

/** Native SQL row-level DML through Spark's own parser/analyzer — no
  * GraftSql wrapper: `GraftDmlRule` (installed via
  * `spark.sql.extensions=graft.table.GraftSparkExtensions`, which
  * [[graft.SparkSpec]] and `Sessions.builder` both set) converts analyzed
  * UPDATE / MERGE INTO / DELETE plans over graft catalog tables into engine
  * commands. */
class NativeSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = tmpDir("graft-dml-warehouse").toString
  private def registerCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.gdml", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdml.warehouse", warehouse)
  }

  test("native UPDATE: expression SET, WHERE, and no-WHERE forms") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdml.up")
    spark.sql("CREATE TABLE gdml.up.t (id BIGINT, v DOUBLE, tag STRING) USING graft")
    spark.range(20).select(col("id"), col("id").cast("double").as("v"),
      lit("a").as("tag")).write.mode("append").saveAsTable("gdml.up.t")

    spark.sql("UPDATE gdml.up.t SET v = v * 2, tag = 'hot' WHERE id >= 15")
    val hot = spark.table("gdml.up.t").filter(col("tag") === "hot")
    hot.count() shouldBe 5
    hot.agg(sum("v")).as[Double].head() shouldBe (15 to 19).map(_ * 2.0).sum
    spark.table("gdml.up.t").filter(col("id") < 15 && col("v") =!= col("id").cast("double"))
      .count() shouldBe 0

    spark.sql("UPDATE gdml.up.t SET tag = 'all'")
    spark.table("gdml.up.t").filter(col("tag") =!= "all").count() shouldBe 0
    // the commits are engine commits on the tx-log
    LakeTable.forPath(spark, s"$warehouse/up/t").history(Some(2))
      .select("operation").as[String].collect().toSet shouldBe Set("UPDATE")
  }

  test("native DELETE accepts predicates beyond the V2 Filter surface") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdml.del")
    spark.sql("CREATE TABLE gdml.del.t (id BIGINT, v DOUBLE) USING graft")
    spark.range(100).select(col("id"), col("id").cast("double").as("v"))
      .write.mode("append").saveAsTable("gdml.del.t")
    // v * 2 > 150 is not expressible as a sources.Filter — SupportsDelete
    // alone would reject it; the rule routes it to the engine's full
    // Column-predicate delete
    spark.sql("DELETE FROM gdml.del.t WHERE v * 2 > 150")
    spark.table("gdml.del.t").count() shouldBe 76
    spark.sql("SELECT max(id) AS m FROM gdml.del.t").collect().head.getLong(0) shouldBe 75L
  }

  test("native MERGE INTO: update/delete/insert/by-source against the API result") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdml.mg")

    def seed(name: String): Unit = {
      spark.sql(s"CREATE TABLE gdml.mg.$name (id BIGINT, v DOUBLE, tag STRING) USING graft")
      spark.range(10).select(col("id"), col("id").cast("double").as("v"),
        lit("old").as("tag")).write.mode("append").saveAsTable(s"gdml.mg.$name")
    }
    seed("sqlt"); seed("apit")
    val source = spark.range(5, 15)
      .select(col("id"), (col("id") * 10.0).as("nv"))
    source.createOrReplaceTempView("mg_src")

    // SQL leg — plain spark.sql, user aliases, conditional clauses
    spark.sql(
      """MERGE INTO gdml.mg.sqlt AS t USING mg_src AS s ON t.id = s.id
         WHEN MATCHED AND s.nv >= 80 THEN UPDATE SET v = s.nv, tag = 'upd'
         WHEN MATCHED THEN DELETE
         WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (s.id, s.nv, 'ins')
         WHEN NOT MATCHED BY SOURCE AND t.id < 2 THEN DELETE""")

    // API leg — the engine builder spelled directly
    val api = LakeTable.forPath(spark, s"$warehouse/mg/apit")
    api.merge(source, col("target.id") === col("source.id"))
      .whenMatchedUpdate(
        Map("v" -> col("source.nv"), "tag" -> lit("upd")),
        Some(col("source.nv") >= 80))
      .whenMatchedDelete()
      .whenNotMatchedInsert(
        Map("id" -> col("source.id"), "v" -> col("source.nv"), "tag" -> lit("ins")))
      .whenNotMatchedBySourceDelete(Some(col("target.id") < 2))
      .execute()

    val got = spark.table("gdml.mg.sqlt").orderBy("id").collect()
    val want = api.read().orderBy("id").collect()
    got shouldBe want
    // sanity on the semantics themselves, not just agreement
    spark.table("gdml.mg.sqlt").filter(col("tag") === "ins").count() shouldBe 5   // 10-14
    spark.table("gdml.mg.sqlt").filter(col("tag") === "upd").count() shouldBe 2   // 8, 9
    spark.table("gdml.mg.sqlt").filter(col("tag") === "old").count() shouldBe 3   // 2, 3, 4
    LakeTable.forPath(spark, s"$warehouse/mg/sqlt").history(Some(1))
      .select("operation").as[String].head() shouldBe "MERGE"
  }

  test("native MERGE honors deletion vectors and exactly-one-clause star form") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdml.dv")
    spark.sql("""CREATE TABLE gdml.dv.t (id BIGINT, v DOUBLE) USING graft
      TBLPROPERTIES ('graft.enableDeletionVectors' = 'true')""")
    spark.range(1000).select(col("id"), col("id").cast("double").as("v"))
      .write.mode("append").saveAsTable("gdml.dv.t")
    val before = LakeTable.forPath(spark, s"$warehouse/dv/t")
      .snapshot().files.map(_.path).toSet
    spark.range(500, 1500).select(col("id"), lit(-1.0).as("v"))
      .createOrReplaceTempView("dv_src")
    spark.sql(
      """MERGE INTO gdml.dv.t t USING dv_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    spark.table("gdml.dv.t").count() shouldBe 1500
    spark.table("gdml.dv.t").filter(col("v") === -1.0).count() shouldBe 1000
    val t = LakeTable.forPath(spark, s"$warehouse/dv/t")
    // matched rows were MASKED, not rewritten
    before.subsetOf(t.snapshot().files.map(_.path).toSet) shouldBe true
    t.snapshot().dvs should not be empty
  }
}
