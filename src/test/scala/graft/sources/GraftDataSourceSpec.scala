package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable

class GraftDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"n$i", i % 5)).toDF("id", "name", "bucket")

  test("write/read round-trip through format(\"graft\")") {
    val dir = tmpDir("ds-rt").resolve("t").toString
    df(0 until 100).write.format("graft").save(dir)
    val back = spark.read.format("graft").load(dir)
    back.count() shouldBe 100
    back.agg(sum("id")).as[Long].collect().head shouldBe (0 until 100).map(_.toLong).sum
    // append mode adds; overwrite replaces
    df(100 until 150).write.format("graft").mode("append").save(dir)
    spark.read.format("graft").load(dir).count() shouldBe 150
    df(0 until 10).write.format("graft").mode("overwrite").save(dir)
    spark.read.format("graft").load(dir).count() shouldBe 10
  }

  test("idempotent batch writes: txnAppId/txnVersion replays are no-ops") {
    val dir = tmpDir("ds-txn").resolve("t").toString
    df(0 until 50).write.format("graft").save(dir)
    def job(version: Long, ids: Range): Unit =
      df(ids).write.format("graft").mode("append")
        .option("txnAppId", "nightly-load").option("txnVersion", version.toString)
        .save(dir)
    job(1, 50 until 100)
    spark.read.format("graft").load(dir).count() shouldBe 100
    // the restarted job re-runs the same logical write: nothing doubles
    job(1, 50 until 100)
    spark.read.format("graft").load(dir).count() shouldBe 100
    // an OLDER version is also a no-op (late replay after a newer commit)
    job(2, 100 until 120)
    job(1, 50 until 100)
    spark.read.format("graft").load(dir).count() shouldBe 120
    // a different app's ledger is independent
    df(120 until 130).write.format("graft").mode("append")
      .option("txnAppId", "other-app").option("txnVersion", "1").save(dir)
    spark.read.format("graft").load(dir).count() shouldBe 130
    // idempotent overwrite: replay keeps the newer state
    df(0 until 7).write.format("graft").mode("overwrite")
      .option("txnAppId", "rebuild").option("txnVersion", "1").save(dir)
    spark.read.format("graft").load(dir).count() shouldBe 7
    df(0 until 99).write.format("graft").mode("overwrite")
      .option("txnAppId", "rebuild").option("txnVersion", "1").save(dir)
    spark.read.format("graft").load(dir).count() shouldBe 7
    // half a pair is a loud error; txn + replaceWhere is refused
    an[IllegalArgumentException] should be thrownBy
      df(0 until 5).write.format("graft").mode("append")
        .option("txnAppId", "x").save(dir)
    an[IllegalArgumentException] should be thrownBy
      df(0 until 5).write.format("graft").mode("overwrite")
        .option("txnAppId", "x").option("txnVersion", "1")
        .option("replaceWhere", "bucket = 1").save(dir)
  }

  test("save modes: errorIfExists throws, ignore is a no-op") {
    val dir = tmpDir("ds-modes").resolve("t").toString
    df(0 until 5).write.format("graft").save(dir)
    an[Exception] should be thrownBy
      df(0 until 5).write.format("graft").mode("error").save(dir)
    df(5 until 20).write.format("graft").mode("ignore").save(dir)
    spark.read.format("graft").load(dir).count() shouldBe 5
  }

  test("partitionBy option applies on create; filters return exact rows") {
    val dir = tmpDir("ds-part").resolve("t").toString
    df(0 until 100).write.format("graft")
      .option("partitionBy", "bucket").save(dir)
    LakeTable.forPath(spark, dir).partitionColumns shouldBe Seq("bucket")
    val filtered = spark.read.format("graft").load(dir)
      .filter(col("bucket") === 2 && col("id") < 50)
    filtered.select("id").as[Long].collect().sorted shouldBe
      (0L until 50L).filter(_ % 5 == 2).toArray
  }

  test("versionAsOf option time-travels; DV masks apply through the format") {
    val dir = tmpDir("ds-tt").resolve("t").toString
    df(0 until 50).write.format("graft").save(dir)
    df(50 until 80).write.format("graft").mode("append").save(dir)
    spark.read.format("graft").option("versionAsOf", 1).load(dir).count() shouldBe 50
    val t = LakeTable.forPath(spark, dir)
    t.setProperties(Map("graft.enableDeletionVectors" -> "true"))
    t.delete(col("id") % 2 === 0)
    spark.read.format("graft").load(dir)
      .select("id").as[Long].collect().forall(_ % 2 == 1) shouldBe true
  }

  test("SQL: CREATE TEMPORARY VIEW ... USING graft") {
    val dir = tmpDir("ds-sql").resolve("t").toString
    df(0 until 30).write.format("graft").save(dir)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ds_v USING graft OPTIONS (path '$dir')")
    spark.sql("SELECT count(*) AS n FROM graft_ds_v WHERE bucket = 1")
      .as[Long].collect().head shouldBe 6
  }

  test("metastore: CREATE TABLE USING graft and saveAsTable round-trip") {
    val dir = tmpDir("ds-cat").resolve("t").toString
    df(0 until 12).write.format("graft").save(dir)
    spark.sql("DROP TABLE IF EXISTS graft_cat_ext")
    spark.sql(s"CREATE TABLE graft_cat_ext USING graft LOCATION '$dir'")
    try {
      spark.sql("SELECT count(*) AS n FROM graft_cat_ext").as[Long]
        .collect().head shouldBe 12
      spark.sql("SELECT sum(id) AS s FROM graft_cat_ext WHERE bucket = 0").as[Long]
        .collect().head shouldBe (0 until 12).filter(_ % 5 == 0).sum.toLong
    } finally spark.sql("DROP TABLE graft_cat_ext"): Unit
    spark.sql("DROP TABLE IF EXISTS graft_cat_ctas")
    df(0 until 7).write.format("graft").saveAsTable("graft_cat_ctas")
    try spark.table("graft_cat_ctas").count() shouldBe 7
    finally spark.sql("DROP TABLE graft_cat_ctas"): Unit
  }

  test("mergeSchema option evolves on append") {
    val dir = tmpDir("ds-evo").resolve("t").toString
    df(0 until 10).write.format("graft").save(dir)
    Seq((100L, "x", 1, "extra")).toDF("id", "name", "bucket", "note")
      .write.format("graft").option("mergeSchema", "true").mode("append").save(dir)
    val back = spark.read.format("graft").load(dir)
    back.columns should contain("note")
    back.filter(col("id") < 100).select("note").collect().forall(_.isNullAt(0)) shouldBe true
  }

  test("overwrite options: replaceWhere and partitionOverwriteMode=dynamic") {
    val dir = tmpDir("ds-ow").resolve("t").toString
    df(0 until 20).write.format("graft").option("partitionBy", "bucket").save(dir)
    // replaceWhere: replace exactly the predicate's partitions
    df(100 until 104).filter(col("bucket") === 0)
      .write.format("graft").mode("overwrite")
      .option("replaceWhere", "bucket = 0").save(dir)
    val t = spark.read.format("graft").load(dir)
    t.filter(col("bucket") === 0).count() shouldBe 1 // only id=100 hits bucket 0
    t.count() shouldBe 17 // 16 untouched rows + 1 replacement
    // dynamic: replace only partitions present in the frame
    df(200 until 202).write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(dir)
    val t2 = spark.read.format("graft").load(dir)
    t2.filter(col("bucket") === 0).count() shouldBe 1 // bucket 0 of 200
    t2.filter(col("bucket") === 1).count() shouldBe 1 // bucket 1 of 201
    t2.count() shouldBe 14 // buckets 2-4 keep their 4 rows each
  }

  test("batch CDF read through format options (readChangeFeed + bounds)") {
    val dir = tmpDir("ds-cdf").resolve("t").toString
    val t = LakeTable.createFrom(spark, dir, df(0 until 10),
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    t.update(col("id") === 3, Map("name" -> lit("upd")))   // v2 (create=0, append=1)
    t.delete(col("id") === 7)                              // v3
    val changes = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("startingVersion", 2)
      .load(dir)
    changes.columns should contain allOf ("_change_type", "_commit_version", "_commit_timestamp")
    val types = changes.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    types("update_preimage") shouldBe 1
    types("update_postimage") shouldBe 1
    types("delete") shouldBe 1
    // ending bound restricts the window; past-head bounds clamp, a
    // starting bound past the head yields an empty frame (not an error)
    spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", 3).option("endingVersion", 99)
      .load(dir).count() shouldBe 1
    spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", 99)
      .load(dir).count() shouldBe 0
  }

  test("small graft table auto-broadcasts: sizeInBytes comes from the tx-log") {
    val dir = tmpDir("ds-size").resolve("dim").toString
    df(0 until 50).write.format("graft").save(dir)
    val dim = spark.read.format("graft").load(dir)
    // plan-time size must be the live-file sum, not defaultSizeInBytes (∞)
    val fact = spark.range(10000).select(
      (col("id") % 50).as("id"), (col("id") * 2).as("m"))
    val joined = fact.join(dim, "id") // no broadcast() hint
    joined.queryExecution.executedPlan.toString should include("BroadcastHashJoin")
    joined.count() shouldBe 10000
  }
}
