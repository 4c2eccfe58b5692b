package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.{GraftSql, LakeTable}

/** Session-catalog integration: 3-level names through pure SQL and the
  * DataFrame API, the reference's primary UX
  * (notebooks/01_bronze_ingestion.py:176-182, migrate_from_hdfs.py:53-54).
  * One warehouse per suite run; the catalog is registered lazily via conf,
  * so no session restart is needed. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = tmpDir("graft-warehouse").toString
  private def registerCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse", warehouse)
  }

  test("pure-SQL round trip: CREATE / INSERT / SELECT / VERSION AS OF") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.bronze")
    spark.sql("""CREATE TABLE gcat.bronze.events (
        id BIGINT, kind STRING, amount DOUBLE, day DATE)
      USING graft PARTITIONED BY (day)
      TBLPROPERTIES ('graft.enableChangeDataFeed' = 'false', 'owner.team' = 'ingest')""")
    spark.sql(
      """INSERT INTO gcat.bronze.events
         SELECT id, concat('k', id % 3) AS kind, id * 1.5 AS amount,
                DATE'2024-01-01' AS day FROM range(100)""")
    spark.sql("SELECT count(*) AS n FROM gcat.bronze.events")
      .collect().head.getLong(0) shouldBe 100
    // second insert -> version bump; VERSION AS OF sees the first state
    spark.sql(
      """INSERT INTO gcat.bronze.events
         SELECT id + 100, 'late' AS kind, 0.0 AS amount, DATE'2024-01-02' AS day
         FROM range(50)""")
    spark.sql("SELECT count(*) AS n FROM gcat.bronze.events").collect()
      .head.getLong(0) shouldBe 150
    spark.sql("SELECT count(*) AS n FROM gcat.bronze.events VERSION AS OF 1")
      .collect().head.getLong(0) shouldBe 100
    // the catalog dir is an ordinary graft table — path API interoperates
    val t = LakeTable.forPath(spark, s"$warehouse/bronze/events")
    t.version shouldBe 2
    t.properties("owner.team") shouldBe "ingest"
    t.snapshot().metadata.partitionColumns shouldBe Seq("day")
  }

  test("DESCRIBE HISTORY / DETAIL through spark.sql on catalog names and paths") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.meta")
    spark.sql("CREATE TABLE gcat.meta.hist (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gcat.meta.hist SELECT id, 'a' FROM range(10)")
    spark.sql("INSERT INTO gcat.meta.hist SELECT id + 10, 'b' FROM range(5)")

    val hist = spark.sql("DESCRIBE HISTORY gcat.meta.hist")
    hist.columns should contain allOf ("version", "operation", "timestamp")
    hist.count() shouldBe 3 // create + 2 inserts
    hist.select("operation").as[String].collect() should contain("WRITE")
    spark.sql("DESCRIBE HISTORY gcat.meta.hist LIMIT 1").count() shouldBe 1

    val det = spark.sql("DESCRIBE DETAIL gcat.meta.hist").collect().head
    det.getAs[String]("format") shouldBe "graft"
    det.getAs[Long]("numFiles") should be >= 1L

    // path form works too, and ordinary SQL is untouched by the parser
    val byPath = spark.sql(s"DESCRIBE HISTORY '$warehouse/meta/hist'")
    byPath.count() shouldBe 3
    spark.sql("SELECT count(*) AS n FROM gcat.meta.hist")
      .collect().head.getLong(0) shouldBe 15

    // history carries the stable logical commitId (one per commit — the
    // observable form of ambiguous-CAS recovery: a retried commit shows ONCE)
    hist.columns should contain("commitId")
    val ids = spark.sql("DESCRIBE HISTORY gcat.meta.hist")
      .select("commitId").as[String].collect()
    ids.foreach(_ should not be null)
    ids.distinct.length shouldBe 3

    // AS JSON: one JSON object per commit, newest first, machine-readable
    val js = spark.sql("DESCRIBE HISTORY gcat.meta.hist AS JSON")
    js.columns shouldBe Array("json")
    val lines = js.as[String].collect()
    lines.length shouldBe 3
    lines.foreach { l =>
      l should startWith("{")
      l should include("\"operation\"")
      l should include("\"commitId\"")
    }
    lines.head should include("\"version\":2")
    spark.sql("DESCRIBE HISTORY gcat.meta.hist LIMIT 1 AS JSON").count() shouldBe 1
  }

  test("SHOW TBLPROPERTIES and DESCRIBE EXTENDED work through the V2 catalog") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.props")
    spark.sql("""CREATE TABLE gcat.props.t (id BIGINT) USING graft
      TBLPROPERTIES ('owner.team' = 'curation', 'delta.enableTypeWidening' = 'true')""")
    val props = spark.sql("SHOW TBLPROPERTIES gcat.props.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    props.get("owner.team") shouldBe Some("curation")
    // delta.-prefixed spellings normalize to the graft namespace at set time
    props.get("graft.enableTypeWidening") shouldBe Some("true")
    // single-property form
    spark.sql("SHOW TBLPROPERTIES gcat.props.t ('owner.team')")
      .collect().head.getString(1) shouldBe "curation"
    // DESCRIBE EXTENDED resolves through the catalog (schema + metadata)
    val desc = spark.sql("DESCRIBE EXTENDED gcat.props.t").collect()
      .map(_.getString(0))
    desc should contain("id")
  }

  test("history operation names and parameter maps match Delta's documented vocabulary") {
    // External tooling (lineage scrapers, audit dashboards) keys off
    // Delta's operation strings and parameter names — pin the op sequence
    // a typical table accumulates to the exact vocabulary Delta documents:
    // operation names are identical and the parameter maps carry Delta's
    // key names (mode, partitionBy, predicate, zOrderBy, version).
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.par")
    spark.sql("CREATE TABLE gcat.par.ops (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gcat.par.ops SELECT id, 'a' FROM range(10)")
    spark.sql("UPDATE gcat.par.ops SET v = 'b' WHERE id = 1")
    spark.sql("DELETE FROM gcat.par.ops WHERE id = 2")
    spark.sql("""MERGE INTO gcat.par.ops t USING (SELECT CAST(99 AS BIGINT) id, 'm' v) s
      ON t.id = s.id WHEN NOT MATCHED THEN INSERT *""")
    spark.sql("ALTER TABLE gcat.par.ops SET TBLPROPERTIES ('owner.team' = 'x')")
    spark.sql("ALTER TABLE gcat.par.ops ADD COLUMNS (w INT)")
    val t = LakeTable.forPath(spark, s"$warehouse/par/ops")
    GraftSql(spark).run(s"OPTIMIZE '${t.dir}' ZORDER BY (id)")
    t.restoreToVersion(2)
    t.vacuum(retainHours = 0.0)
    val hist = t.history().select("version", "operation", "operationParameters")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getAs[Map[String, String]](2)))).toMap
    // exact Delta operation strings, oldest → newest
    hist(0)._1 shouldBe "CREATE TABLE"
    hist(0)._2.keySet should contain("partitionBy")
    hist(1)._1 shouldBe "WRITE"
    hist(1)._2.get("mode") shouldBe Some("Append")
    hist(2)._1 shouldBe "UPDATE"
    hist(2)._2.keySet should contain("predicate")
    hist(3)._1 shouldBe "DELETE"
    hist(3)._2.keySet should contain("predicate")
    hist(4)._1 shouldBe "MERGE"
    hist(4)._2.keySet should contain("predicate")
    hist(5)._1 shouldBe "SET TBLPROPERTIES"
    hist(6)._1 shouldBe "ADD COLUMNS"
    hist(7)._1 shouldBe "OPTIMIZE"
    hist(7)._2.get("zOrderBy") shouldBe Some("id")
    hist(8)._1 shouldBe "RESTORE"
    hist(8)._2.get("version") shouldBe Some("2")
    hist(9)._1 shouldBe "VACUUM"
    // every name the table can ever write is inside Delta's documented
    // vocabulary (ours adds none; REORG/DROP FEATURE exist there too)
    val deltaVocabulary = Set(
      "WRITE", "STREAMING UPDATE", "DELETE", "MERGE", "UPDATE",
      "CREATE TABLE", "REPLACE TABLE", "COPY INTO", "CLONE", "CONVERT",
      "OPTIMIZE", "RESTORE", "VACUUM", "REORG",
      "ADD COLUMNS", "DROP COLUMN", "RENAME COLUMN", "ALTER COLUMN TYPE",
      "ALTER COLUMN DEFAULT", "ADD GENERATED COLUMN", "ADD IDENTITY COLUMN",
      "SET TBLPROPERTIES", "UNSET TBLPROPERTIES",
      "ADD CONSTRAINT", "DROP CONSTRAINT", "ANALYZE",
      "UPGRADE PROTOCOL", "ADD FEATURE", "DROP FEATURE")
    hist.values.map(_._1).toSet.subsetOf(deltaVocabulary) shouldBe true
    // the AS JSON surface serializes the same names/params machine-readably
    val js = GraftSql(spark).run(s"DESCRIBE HISTORY '${t.dir}' AS JSON")
      .as[String].collect()
    js.length shouldBe 10
    js.last should include("\"operation\":\"CREATE TABLE\"")
    js.find(_.contains("\"OPTIMIZE\"")).get should include("\"zOrderBy\":\"id\"")
  }

  test("native ALTER COLUMN TYPE widens through the V2 catalog") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.widen")
    spark.sql("""CREATE TABLE gcat.widen.t (k BIGINT, v INT) USING graft
      TBLPROPERTIES ('delta.enableTypeWidening' = 'true')""")
    spark.sql("INSERT INTO gcat.widen.t SELECT id, CAST(id AS INT) FROM range(5)")
    spark.sql("ALTER TABLE gcat.widen.t ALTER COLUMN v TYPE BIGINT")
    spark.sql("INSERT INTO gcat.widen.t VALUES (99, 3000000000)")
    spark.table("gcat.widen.t").schema("v").dataType shouldBe
      org.apache.spark.sql.types.LongType
    spark.sql("SELECT sum(v) FROM gcat.widen.t").collect().head.getLong(0) shouldBe
      (0L + 1 + 2 + 3 + 4 + 3000000000L)
    // a narrowing through the same surface refuses
    an[Exception] should be thrownBy
      spark.sql("ALTER TABLE gcat.widen.t ALTER COLUMN v TYPE INT")
  }

  test("column DEFAULT values: CREATE DDL, INSERT fill, ALTER SET/DROP, path-API append") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dflt")
    spark.sql("""CREATE TABLE gcat.dflt.t (
        id BIGINT, status STRING DEFAULT 'new', score DOUBLE DEFAULT 0.5)
      USING graft""")
    // INSERT omitting defaulted columns: Spark's ResolveDefaultColumns fills
    spark.sql("INSERT INTO gcat.dflt.t (id) VALUES (1), (2)")
    spark.sql("INSERT INTO gcat.dflt.t (id, status) VALUES (3, 'done')")
    val rows = spark.table("gcat.dflt.t").orderBy("id")
      .as[(Long, String, Double)].collect()
    rows shouldBe Array((1L, "new", 0.5), (2L, "new", 0.5), (3L, "done", 0.5))

    // ALTER COLUMN SET DEFAULT: future inserts change, old rows untouched
    spark.sql("ALTER TABLE gcat.dflt.t ALTER COLUMN status SET DEFAULT 'queued'")
    spark.sql("INSERT INTO gcat.dflt.t (id) VALUES (4)")
    spark.table("gcat.dflt.t").filter(col("id") === 4)
      .select("status").as[String].head() shouldBe "queued"
    spark.table("gcat.dflt.t").filter(col("id") === 1)
      .select("status").as[String].head() shouldBe "new"

    // the path-based write API honors the same metadata
    val lake = LakeTable.forPath(spark, s"$warehouse/dflt/t")
    lake.append(Seq(5L).toDF("id"))
    lake.read().filter(col("id") === 5)
      .select("status", "score").as[(String, Double)].head() shouldBe (("queued", 0.5))

    // DROP DEFAULT reverts to NULL fill on the path API
    spark.sql("ALTER TABLE gcat.dflt.t ALTER COLUMN status DROP DEFAULT")
    lake.append(Seq(6L).toDF("id"))
    LakeTable.forPath(spark, s"$warehouse/dflt/t").read()
      .filter(col("id") === 6).select("status").as[String].head() shouldBe null

    // MERGE insert clauses that omit a defaulted column also fill it
    spark.sql("ALTER TABLE gcat.dflt.t ALTER COLUMN status SET DEFAULT 'merged'")
    val lake2 = LakeTable.forPath(spark, s"$warehouse/dflt/t")
    lake2.merge(Seq(100L).toDF("id"), col("target.id") === col("source.id"))
      .whenNotMatchedInsert(Map("id" -> col("source.id")))
      .execute()
    LakeTable.forPath(spark, s"$warehouse/dflt/t").read()
      .filter(col("id") === 100).select("status", "score")
      .as[(String, Double)].head() shouldBe (("merged", 0.5))

    // ADD COLUMN with DEFAULT is rejected (backfill hazard, Delta parity)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gcat.dflt.t ADD COLUMN extra STRING DEFAULT 'x'")
    }
    e.getMessage should (include("DEFAULT") or include("default"))
  }

  test("SHOW PARTITIONS answers from the log: per-partition files/rows/bytes, DV-aware") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.parts")
    spark.sql("""CREATE TABLE gcat.parts.t (id BIGINT, p STRING)
      USING graft PARTITIONED BY (p)""")
    spark.sql("INSERT INTO gcat.parts.t SELECT id, 'a' FROM range(100)")
    spark.sql("INSERT INTO gcat.parts.t SELECT id + 100, 'b' FROM range(50)")
    val rows = spark.sql("SHOW PARTITIONS gcat.parts.t")
      .orderBy("p").collect()
    rows.map(_.getAs[String]("p")).toSeq shouldBe Seq("a", "b")
    rows.map(_.getAs[Long]("numRecords")).toSeq shouldBe Seq(100L, 50L)
    rows.foreach(r => r.getAs[Long]("numFiles") should be >= 1L)
    // DV-masked rows drop out of the metadata answer
    spark.sql("ALTER TABLE gcat.parts.t SET TBLPROPERTIES " +
      "('graft.enableDeletionVectors' = 'true')")
    spark.sql("DELETE FROM gcat.parts.t WHERE p = 'a' AND id < 10")
    spark.sql("SHOW PARTITIONS gcat.parts.t").orderBy("p").collect()
      .map(_.getAs[Long]("numRecords")).toSeq shouldBe Seq(90L, 50L)
    // unpartitioned tables refuse, like Spark/Delta
    spark.sql("CREATE TABLE gcat.parts.u (id BIGINT) USING graft")
    val e = intercept[Exception] { spark.sql("SHOW PARTITIONS gcat.parts.u").collect() }
    e.getMessage should include("not partitioned")
  }

  test("DESCRIBE DETAIL surfaces per-file clusteredBy tags (incremental state)") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.clus")
    spark.sql("CREATE TABLE gcat.clus.t (id BIGINT, k BIGINT) USING graft")
    spark.sql("INSERT INTO gcat.clus.t SELECT id, id % 50 FROM range(200)")
    // before clustering: no tags at all
    val det0 = spark.sql("DESCRIBE DETAIL gcat.clus.t").collect().head
    det0.getAs[Map[String, Long]]("clusteredBy") shouldBe empty
    spark.sql("OPTIMIZE gcat.clus.t ZORDER BY (k)").collect()
    val t = LakeTable.forPath(spark, s"$warehouse/clus/t")
    val det1 = spark.sql("DESCRIBE DETAIL gcat.clus.t").collect().head
    // every live file is now tagged with this curve:cols provenance
    det1.getAs[Map[String, Long]]("clusteredBy") shouldBe
      Map("zorder:k" -> t.snapshot().numFiles.toLong)
    // a later plain append is untagged: the map shows the clustered subset
    spark.sql("INSERT INTO gcat.clus.t SELECT id + 200, id % 50 FROM range(100)")
    val det2 = spark.sql("DESCRIBE DETAIL gcat.clus.t").collect().head
    val tagged = det2.getAs[Map[String, Long]]("clusteredBy")("zorder:k")
    tagged should be < det2.getAs[Long]("numFiles")
    tagged shouldBe det1.getAs[Map[String, Long]]("clusteredBy")("zorder:k")
  }

  test("native spark.sql maintenance: OPTIMIZE / VACUUM / RESTORE / REORG / GENERATE") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.maint")
    spark.sql("CREATE TABLE gcat.maint.t (id BIGINT, k BIGINT) USING graft")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO gcat.maint.t SELECT id + ${i * 100}, id % 50 FROM range(100)")
    }
    val path = LakeTable.forPath(spark, s"$warehouse/maint/t")
    val before = path.snapshot().numFiles

    val ov = spark.sql("OPTIMIZE gcat.maint.t ZORDER BY (k)").collect().head
    ov.schema.fieldNames shouldBe
      Array("version", "numFilesAdded", "numFilesRemoved", "numOutputRows")
    ov.getAs[Long]("numFilesRemoved") should be >= 1L
    ov.getAs[Long]("numOutputRows") shouldBe 400L
    path.snapshot().numFiles should be <= before
    path.read().count() shouldBe 400

    // restore BEFORE vacuum — the pre-optimize files must still exist
    // (restoring past a vacuum horizon fails in Delta for the same reason)
    spark.sql("RESTORE TABLE gcat.maint.t TO VERSION AS OF 2").collect()
      .head.getLong(0) should be >= 2L
    spark.sql("SELECT count(*) FROM gcat.maint.t").collect().head.getLong(0) shouldBe 200

    // vacuum with retain 0: files referenced by NO live version physically go
    val removed = spark.sql("VACUUM gcat.maint.t RETAIN 0 HOURS").collect()
    removed.length should be >= 1
    spark.sql("SELECT count(*) FROM gcat.maint.t").collect().head.getLong(0) shouldBe 200

    // DV delete then REORG through spark.sql
    spark.sql("ALTER TABLE gcat.maint.t SET TBLPROPERTIES " +
      "('graft.enableDeletionVectors' = 'true')")
    spark.sql("DELETE FROM gcat.maint.t WHERE id % 10 = 0")
    LakeTable.forPath(spark, s"$warehouse/maint/t").snapshot().dvs should not be empty
    spark.sql("REORG TABLE gcat.maint.t APPLY (PURGE)").collect()
    LakeTable.forPath(spark, s"$warehouse/maint/t").snapshot().dvs shouldBe empty

    val m = spark.sql("GENERATE symlink_format_manifest FOR TABLE gcat.maint.t")
      .collect().head.getString(0)
    m should include("_symlink_format_manifest")
    java.nio.file.Files.exists(java.nio.file.Paths.get(m, "manifest")) shouldBe true
  }

  test("filter pushdown prunes files through spark.table") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.silver")
    spark.sql("CREATE TABLE gcat.silver.parts (id BIGINT, bucket INT) USING graft")
    // three appends -> three files with disjoint id ranges (stats prune)
    (0 until 3).foreach { k =>
      spark.range(k * 100, (k + 1) * 100).select(col("id"), lit(k).as("bucket"))
        .write.mode("append").saveAsTable("gcat.silver.parts")
    }
    val cnt = spark.table("gcat.silver.parts").filter(col("id") < 100).count()
    cnt shouldBe 100
    // equality filter over a stats-pruned range reads a single file
    val df = spark.table("gcat.silver.parts").filter(col("id") === 250)
    df.collect().map(_.getLong(0)) shouldBe Array(250L)
  }

  test("saveAsTable CTAS, overwrite mode, and DataFrame round trip") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.gold")
    val df = (1 to 20).map(i => (i.toLong, s"c$i")).toDF("id", "name")
    df.write.saveAsTable("gcat.gold.dims") // CTAS through the catalog
    spark.table("gcat.gold.dims").count() shouldBe 20
    // append mode
    df.write.mode("append").saveAsTable("gcat.gold.dims")
    spark.table("gcat.gold.dims").count() shouldBe 40
    // overwrite mode truncates
    df.filter(col("id") <= 5).write.mode("overwrite").saveAsTable("gcat.gold.dims")
    spark.table("gcat.gold.dims").count() shouldBe 5
  }

  test("catalog DDL: list/drop/rename tables and namespaces, ALTER properties") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ddl")
    spark.sql("CREATE TABLE gcat.ddl.a (id BIGINT) USING graft")
    spark.sql("CREATE TABLE gcat.ddl.b (id BIGINT) USING graft")
    spark.sql("SHOW TABLES IN gcat.ddl").collect()
      .map(_.getString(1)).toSet shouldBe Set("a", "b")
    spark.sql("ALTER TABLE gcat.ddl.a SET TBLPROPERTIES ('x.y' = 'z')")
    LakeTable.forPath(spark, s"$warehouse/ddl/a").properties("x.y") shouldBe "z"
    spark.sql("ALTER TABLE gcat.ddl.a ADD COLUMNS (extra STRING)")
    spark.table("gcat.ddl.a").schema.fieldNames should contain("extra")
    spark.sql("ALTER TABLE gcat.ddl.b RENAME TO gcat.ddl.c")
    spark.sql("SHOW TABLES IN gcat.ddl").collect()
      .map(_.getString(1)).toSet shouldBe Set("a", "c")
    spark.sql("DROP TABLE gcat.ddl.c")
    spark.sql("SHOW TABLES IN gcat.ddl").collect()
      .map(_.getString(1)).toSet shouldBe Set("a")
    spark.sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)) should contain("ddl")
  }

  test("TIMESTAMP AS OF resolves through the catalog") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.tt")
    spark.sql("CREATE TABLE gcat.tt.t (id BIGINT) USING graft")
    spark.range(10).write.mode("append").saveAsTable("gcat.tt.t")
    val afterV1 = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(5) // commit timestamps are millis; separate the versions
    spark.range(10, 30).write.mode("append").saveAsTable("gcat.tt.t")
    spark.sql("SELECT count(*) AS n FROM gcat.tt.t").collect()
      .head.getLong(0) shouldBe 30
    spark.sql(s"SELECT count(*) AS n FROM gcat.tt.t TIMESTAMP AS OF '$afterV1'")
      .collect().head.getLong(0) shouldBe 10
  }

  test("deletion vectors and GraftSql DML compose with catalog reads") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    spark.sql("""CREATE TABLE gcat.dml.t (id BIGINT, v DOUBLE) USING graft
      TBLPROPERTIES ('graft.enableDeletionVectors' = 'true')""")
    spark.range(100).select(col("id"), (col("id") * 2.0).as("v"))
      .write.mode("append").saveAsTable("gcat.dml.t")
    // DML through GraftSql addressing the table by its CATALOG name —
    // the resolver maps gcat.ns.t onto the registered warehouse
    val sql = GraftSql(spark)
    sql.run("DELETE FROM gcat.dml.t WHERE id < 10")
    // catalog read sees the masked state
    spark.table("gcat.dml.t").count() shouldBe 90
    spark.sql("SELECT min(id) AS m FROM gcat.dml.t").collect()
      .head.getLong(0) shouldBe 10L
  }

  test("native spark.sql DELETE FROM and TRUNCATE TABLE via SupportsDelete") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.del")
    spark.sql("""CREATE TABLE gcat.del.t (id BIGINT, v DOUBLE) USING graft
      TBLPROPERTIES ('graft.enableDeletionVectors' = 'true')""")
    spark.range(100).select(col("id"), (col("id") * 2.0).as("v"))
      .write.mode("append").saveAsTable("gcat.del.t")
    val path = s"$warehouse/del/t"
    val before = LakeTable.forPath(spark, path).snapshot().files.map(_.path).toSet
    // no GraftSql wrapper — Spark's own DELETE FROM plans onto deleteWhere
    spark.sql("DELETE FROM gcat.del.t WHERE id < 25 OR id >= 90")
    spark.table("gcat.del.t").count() shouldBe 65
    spark.sql("SELECT min(id) AS m, max(id) AS x FROM gcat.del.t")
      .collect().head.toSeq shouldBe Seq(25L, 89L)
    val t = LakeTable.forPath(spark, path)
    // the delete honored the table's own settings: DV masks, no rewrite
    t.snapshot().files.map(_.path).toSet shouldBe before
    t.snapshot().dvs should not be empty
    // TRUNCATE arrives through SupportsDelete's TruncatableTable default
    spark.sql("TRUNCATE TABLE gcat.del.t")
    spark.table("gcat.del.t").count() shouldBe 0
    // both DML landed as commits on the same tx-log
    LakeTable.forPath(spark, path).history(Some(2))
      .select("operation").as[String].collect().toSet shouldBe Set("DELETE")
  }

  test("INSERT OVERWRITE: full, static partition, and writeTo dynamic modes") {
    registerCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ow")
    spark.sql("""CREATE TABLE gcat.ow.t (id BIGINT, day STRING) USING graft
      PARTITIONED BY (day)""")
    def rows(ids: Range, day: String) =
      ids.map(i => (i.toLong, day)).toDF("id", "day")
    rows(0 until 10, "d0").union(rows(10 until 20, "d1"))
      .write.mode("append").saveAsTable("gcat.ow.t")

    // dynamic overwrite (Delta's option spelling — Spark's V1-write bridge
    // has no dynamic-overwrite exec, so the mode rides the format writer):
    // only the partitions present in the frame change
    rows(100 until 105, "d1").write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(s"$warehouse/ow/t")
    spark.table("gcat.ow.t").count() shouldBe 15 // d0 keeps its 10, d1 -> 5
    spark.sql("SELECT count(*) FROM gcat.ow.t WHERE day = 'd0'")
      .collect().head.getLong(0) shouldBe 10

    // static partition overwrite through SQL replaces exactly that partition
    spark.sql("""INSERT OVERWRITE gcat.ow.t PARTITION (day = 'd0')
      SELECT id FROM range(3)""")
    spark.sql("SELECT count(*) FROM gcat.ow.t WHERE day = 'd0'")
      .collect().head.getLong(0) shouldBe 3
    spark.sql("SELECT count(*) FROM gcat.ow.t WHERE day = 'd1'")
      .collect().head.getLong(0) shouldBe 5

    // full INSERT OVERWRITE truncates then loads
    spark.sql("""INSERT OVERWRITE gcat.ow.t
      SELECT id, 'd9' AS day FROM range(4)""")
    spark.table("gcat.ow.t").count() shouldBe 4
    // the commits carry the modes for DESCRIBE HISTORY forensics
    val params = GraftSql(spark).run("DESCRIBE HISTORY gcat.ow.t")
      .select("operationParameters").collect()
      .map(_.getMap[String, String](0))
    params.exists(_.get("partitionOverwriteMode").contains("dynamic")) shouldBe true
    params.exists(_.get("replaceWhere").exists(_.contains("day"))) shouldBe true
  }
}
