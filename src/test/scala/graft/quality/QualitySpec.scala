package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable

class QualitySpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, None, Some(200.0)),
      (2L, Some("c"), None),
      (3L, Some("d"), Some(-5.0))
    ).toDF("id", "name", "amount")
  }

  test("cascadeReport: first-fail attribution, NULLs fail, filter agrees") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some(10), Some(0.1)),  // passes both
      (2L, Some(1), Some(0.1)),   // dies at stage 0 (tokens)
      (3L, Some(1), Some(0.9)),   // would fail both -> attributed to stage 0
      (4L, Some(10), Some(0.9)),  // dies at stage 1 (punct)
      (5L, None, Some(0.1)),      // NULL tokens -> fails stage 0
      (6L, Some(10), None)        // NULL punct -> fails stage 1
    ).toDF("id", "tok", "punct")
    val stages = Seq(
      "min_tokens" -> (col("tok") >= 5),
      "max_punct" -> (col("punct") <= 0.5))
    val report = Quality.cascadeReport(docs, stages)
      .as[(Int, String, Long, Long)].collect().toSeq
    report shouldBe Seq(
      (0, "min_tokens", 3L, 3L), // docs 2,3,5 die here; 1,4,6 continue
      (1, "max_punct", 2L, 1L))  // docs 4,6 die here; doc 1 survives
    Quality.cascadeFilter(docs, stages).select("id").as[Long].collect().toSeq shouldBe Seq(1L)
  }

  test("completeness: one-pass null counts per column (Q1)") {
    val rep = Quality.completeness(df, Seq("name", "amount")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    rep("name") shouldBe (1L, 4L)
    rep("amount") shouldBe (1L, 4L)
  }

  test("uniqueness and duplicate ids (Q2/Q5)") {
    val u = Quality.uniqueness(df, Seq("id")).collect().head
    u.getAs[Long]("total_rows") shouldBe 4
    u.getAs[Long]("distinct_keys") shouldBe 3
    u.getAs[Long]("duplicate_rows") shouldBe 1
    u.getAs[Boolean]("is_unique") shouldBe false

    val dups = Quality.duplicateIds(df, Seq("id")).collect()
    dups.length shouldBe 1
    dups.head.getLong(0) shouldBe 2L
  }

  test("range validation flags out-of-range rows per column (Q3)") {
    val r = Quality.rangeValidation(df, Map("amount" -> (0.0, 100.0))).collect().head
    r.getAs[Long]("out_of_range_rows") shouldBe 2 // 200.0 and -5.0; null not counted
  }

  test("migration validation: counts + schema diff excluding metadata cols (Q4)") {
    val target = df.withColumn("_record_hash", sha2(to_json(struct(col("id"))), 256))
    val rep = Quality.migrationValidation(df, target).collect().head
    rep.getAs[Boolean]("counts_match") shouldBe true
    rep.getAs[Boolean]("schemas_match") shouldBe true
    rep.getAs[Boolean]("validation_passed") shouldBe true

    val bad = Quality.migrationValidation(df, target.drop("name").limit(2))
      .collect().head
    bad.getAs[Boolean]("counts_match") shouldBe false
    bad.getAs[Seq[String]]("columns_only_in_source") shouldBe Seq("name")
    bad.getAs[Boolean]("validation_passed") shouldBe false
  }

  test("quality over versions via time travel (Q6)") {
    import spark.implicits._
    val t = LakeTable.createFrom(spark, tmpDir("qv").resolve("t").toString,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((2L, "dup"), (3L, null.asInstanceOf[String])).toDF("id", "v"))
    val rows = Quality.qualityOverVersions(t, Seq("id"), Seq("v"))
      .orderBy("version").collect()
    rows.last.getAs[Long]("rows") shouldBe 4
    rows.last.getAs[Long]("duplicate_rows") shouldBe 1
    rows.map(_.getAs[Long]("rows")).max shouldBe 4
  }
}
