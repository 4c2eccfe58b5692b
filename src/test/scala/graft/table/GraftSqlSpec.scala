package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL-string command surface the reference drives via spark.sql. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): (LakeTable, String) = {
    val dir = tmpDir(name).resolve("t").toString
    val t = LakeTable.createFrom(spark, dir,
      (1 to 200).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "v", "b"))
    (t, dir)
  }

  private lazy val sql = GraftSql(spark)

  test("DESCRIBE HISTORY / DETAIL / SHOW TBLPROPERTIES") {
    val (t, dir) = freshTable("gsql-desc")
    t.append(Seq((201L, "x", 0)).toDF("id", "v", "b"))
    sql.run(s"DESCRIBE HISTORY '$dir'").count() shouldBe 3
    sql.run(s"DESCRIBE HISTORY '$dir' LIMIT 1").count() shouldBe 1
    sql.run(s"DESCRIBE DETAIL '$dir'")
      .select("numFiles").as[Long].head() should be >= 1L
    sql.run(s"ALTER TABLE '$dir' SET TBLPROPERTIES ('owner' = 'etl', quality = gold)")
    val props = sql.run(s"SHOW TBLPROPERTIES '$dir'")
      .as[(String, String)].collect().toMap
    props("owner") shouldBe "etl"
    props("quality") shouldBe "gold"
  }

  test("delta.-prefixed properties normalize to graft. and take effect") {
    val (t, dir) = freshTable("gsql-dprop")
    // the reference's own spelling (src/delta_utils.py:52-55) works verbatim
    sql.run(s"""ALTER TABLE '$dir' SET TBLPROPERTIES (
      'delta.enableChangeDataFeed' = 'true',
      'delta.enableDeletionVectors' = 'true')""")
    val props = sql.run(s"SHOW TBLPROPERTIES '$dir'")
      .as[(String, String)].collect().toMap
    props.get("graft.enableChangeDataFeed") shouldBe Some("true")
    props.get("graft.enableDeletionVectors") shouldBe Some("true")
    props.keys.exists(_.startsWith("delta.")) shouldBe false
    // and they actually switch the DML paths: a delete writes a mask
    // (no rewrite) and emits CDF rows
    t.delete(org.apache.spark.sql.functions.col("id") <= 5)
    t.snapshot().dvs.size should be >= 1
    t.changes(t.version, None)
      .filter(org.apache.spark.sql.functions.col("_change_type") === "delete")
      .count() shouldBe 5
  }

  // mirrors notebooks/04_acid_operations.py:289-295 (ADD COLUMNS with
  // per-column COMMENT), plus a parenthesized type to stress the parser
  test("ALTER TABLE ADD COLUMNS with comments and complex types") {
    val (t, dir) = freshTable("gsql-addcols")
    sql.run(
      s"""ALTER TABLE '$dir'
          ADD COLUMNS (
              experiment_id STRING COMMENT 'A/B test experiment ID',
              experiment_variant STRING COMMENT 'A/B test variant',
              score DECIMAL(18,2)
          )""")
    val schema = t.snapshot().schema
    schema.fieldNames should contain allOf
      ("experiment_id", "experiment_variant", "score")
    schema("experiment_id").getComment() shouldBe Some("A/B test experiment ID")
    schema("score").dataType shouldBe
      org.apache.spark.sql.types.DecimalType(18, 2)
    // old rows read back with nulls in the new columns
    t.read().filter(col("experiment_id").isNull).count() shouldBe 200
    an[IllegalArgumentException] should be thrownBy
      sql.run(s"ALTER TABLE '$dir' ADD COLUMNS (id BIGINT)")
  }

  test("ALTER TABLE ADD COLUMN GENERATED ALWAYS AS (expr) / AS IDENTITY") {
    val (t, dir) = freshTable("gsql-gencol")
    sql.run(s"ALTER TABLE '$dir' ADD COLUMN b2 BIGINT GENERATED ALWAYS AS (b * 2)")
    sql.run(s"ALTER TABLE '$dir' ADD COLUMN rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 5)")
    t.append(Seq((1000L, "x", 3)).toDF("id", "v", "b"))
    val r = t.read().filter(col("id") === 1000L)
      .select("b2", "rid").head()
    r.getLong(0) shouldBe 6L    // generated: b * 2
    r.getLong(1) shouldBe 10L   // identity: first allocation at START WITH
    // bare IDENTITY defaults to (1, 1)
    sql.run(s"ALTER TABLE '$dir' ADD COLUMN rid2 BIGINT GENERATED ALWAYS AS IDENTITY")
    t.properties("graft.identity.rid2") shouldBe "1,1"
  }

  test("RESTORE TABLE TO VERSION AS OF") {
    val (t, dir) = freshTable("gsql-restore")
    val v = t.version
    t.delete(col("id") <= 100L)
    t.read().count() shouldBe 100
    val out = sql.run(s"RESTORE TABLE '$dir' TO VERSION AS OF $v").collect().head
    t.read().count() shouldBe 200
    // Delta-style restore metrics: the commit's own add/remove counts +
    // the post-restore table shape
    out.getAs[Long]("restored_version") shouldBe t.version
    out.getAs[Long]("num_restored_files") should be >= 1L
    out.getAs[Long]("num_of_files_after_restore") shouldBe
      t.log.snapshot().numFiles.toLong
    out.getAs[Long]("table_size_after_restore") should be > 0L
  }

  test("OPTIMIZE and OPTIMIZE ZORDER BY") {
    val (t, dir) = freshTable("gsql-opt")
    (0 until 4).foreach(i => t.append(Seq((300L + i, "y", i)).toDF("id", "v", "b")))
    val before = t.snapshot().numFiles
    sql.run(s"OPTIMIZE '$dir'")
    t.snapshot().numFiles should be < before
    sql.run(s"OPTIMIZE '$dir' ZORDER BY (id, b)")
    t.read().count() shouldBe 204
  }

  test("VACUUM RETAIN 0 HOURS with and without DRY RUN") {
    val (t, dir) = freshTable("gsql-vac")
    t.overwrite((1 to 10).map(i => (i.toLong, "z", 0)).toDF("id", "v", "b"))
    val dry = sql.run(s"VACUUM '$dir' RETAIN 0 HOURS DRY RUN")
    dry.count() should be >= 1L
    sql.run(s"VACUUM '$dir' RETAIN 0 HOURS").count() shouldBe dry.count()
    t.read().count() shouldBe 10 // live data untouched
  }

  test("CREATE TABLE ... SHALLOW/DEEP CLONE") {
    val (_, dir) = freshTable("gsql-clone")
    val dst = tmpDir("gsql-clone-dst").resolve("c").toString
    sql.run(s"CREATE TABLE IF NOT EXISTS '$dst' DEEP CLONE '$dir'")
    LakeTable.forPath(spark, dst).read().count() shouldBe 200
  }

  test("UPDATE and DELETE SQL forms") {
    val (t, dir) = freshTable("gsql-dml")
    sql.run(s"UPDATE '$dir' SET v = concat(v, '!') WHERE id <= 10")
    t.read().filter(col("v").endsWith("!")).count() shouldBe 10
    sql.run(s"DELETE FROM '$dir' WHERE b = 3")
    t.read().filter(col("b") === 3).count() shouldBe 0
    t.read().count() shouldBe 150
    // unconditional forms
    sql.run(s"UPDATE '$dir' SET b = b + 10")
    t.read().filter(col("b") < 10).count() shouldBe 0
    sql.run(s"DELETE FROM '$dir'")
    t.read().count() shouldBe 0
  }

  test("MERGE INTO SQL form: update/delete/insert clauses with aliases") {
    val (t, dir) = freshTable("gsql-merge")
    // source: updates for 1..50 (drop id 7), inserts 201..210
    ((1 to 50) ++ (201 to 210)).map(i => (i.toLong, s"s$i"))
      .toDF("id", "v").createOrReplaceTempView("gsql_merge_src")
    sql.run(
      s"""MERGE INTO '$dir' AS t
          USING gsql_merge_src AS s
          ON t.id = s.id
          WHEN MATCHED AND t.id = 7 THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT (id, v, b) VALUES (s.id, s.v, 9)""")
    val out = t.read()
    out.count() shouldBe 209 // 200 - 1 deleted + 10 inserted
    out.filter(col("id") === 7).count() shouldBe 0
    out.filter(col("id") === 3).select("v").as[String].head() shouldBe "s3"
    out.filter(col("id") === 205).select("b").as[Int].head() shouldBe 9
    // subquery source + INSERT * + UPDATE SET * + NOT MATCHED BY SOURCE
    (150 to 205).map(i => (i.toLong, s"z$i", 1))
      .toDF("id", "v", "b").createOrReplaceTempView("gsql_merge_src2")
    sql.run(
      s"""MERGE INTO '$dir' AS t
          USING (SELECT id, v, b FROM gsql_merge_src2) AS s
          ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE AND t.id > 200 THEN DELETE""")
    val out2 = t.read()
    out2.count() shouldBe 204 // 206..210 deleted by NMBS, 150..205 updated
    out2.filter(col("id") === 150).select("v").as[String].head() shouldBe "z150"
    out2.filter(col("id") > 205).count() shouldBe 0
  }

  test("DML parser: CASE WHEN in expressions, literals with keywords/multi-space") {
    val (t, dir) = freshTable("gsql-parse")
    // CASE WHEN inside UPDATE SET (its WHEN/THEN must not read as clause
    // boundaries), plus a string literal containing a keyword
    Seq((5L, "src", 0), (300L, "new", 1)).toDF("id", "v", "b")
      .createOrReplaceTempView("gsql_parse_src")
    sql.run(
      s"""MERGE INTO '$dir' AS t USING gsql_parse_src AS s
          ON t.id = s.id
          WHEN MATCHED AND t.v != 'not WHERE  this' THEN
            UPDATE SET v = CASE WHEN s.b > 0 THEN 'big' ELSE 'small' END
          WHEN NOT MATCHED THEN INSERT (id, v, b) VALUES (s.id, 'case WHEN x THEN', s.b)""")
    t.read().filter(col("id") === 5L).select("v").as[String].head() shouldBe "small"
    t.read().filter(col("id") === 300L).select("v").as[String].head() shouldBe "case WHEN x THEN"
    // multi-space string literal in UPDATE must reach the engine verbatim
    sql.run(s"UPDATE '$dir' SET v = 'two  spaces' WHERE id = 5")
    t.read().filter(col("id") === 5L).select("v").as[String].head() shouldBe "two  spaces"
    // doubled-quote escape inside a literal containing a keyword
    sql.run(s"DELETE FROM '$dir' WHERE v = 'it''s not WHERE b = 1' OR id = 300")
    t.read().filter(col("id") === 300L).count() shouldBe 0
  }

  test("ANALYZE TABLE COMPUTE STATISTICS [FOR COLUMNS]") {
    val (_, dir) = freshTable("gsql-analyze")
    val all = sql.run(s"ANALYZE TABLE '$dir' COMPUTE STATISTICS")
      .as[(String, String)].collect().toMap
    all("stats.numRows") shouldBe "200"
    val one = sql.run(s"ANALYZE TABLE '$dir' COMPUTE STATISTICS FOR COLUMNS id")
      .as[(String, String)].collect().toMap
    one.keys.filter(_.endsWith(".distinctCount")) shouldBe Set("stats.id.distinctCount")
  }

  test("non-command SQL falls through to spark.sql") {
    val (t, dir) = freshTable("gsql-fallthrough")
    t.createOrReplaceTempView("gsql_v")
    sql.run("SELECT count(*) AS n FROM gsql_v").as[Long].head() shouldBe 200
  }
}
