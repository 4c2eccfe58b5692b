package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Column mapping via parquet field ids: RENAME/DROP COLUMN are
  * metadata-only commits — no data file is rewritten, readers resolve
  * columns by id. Dropped ids are retired forever, so a later column with
  * the same NAME can never resurface the dropped column's bytes. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): LakeTable =
    LakeTable.createFrom(spark, tmpDir(name).resolve("t").toString,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "amount"))

  test("RENAME COLUMN is metadata-only and preserves data") {
    val t = fresh("cm-rename")
    val filesBefore = t.snapshot().files.map(_.path).toSet
    t.renameColumn("amount", "total")
    t.snapshot().files.map(_.path).toSet shouldBe filesBefore // untouched
    t.schema.fieldNames.toSeq shouldBe Seq("id", "name", "total")
    t.read().orderBy("id").select("total").as[Double].collect() shouldBe Array(10.0, 20.0)
    // writes after the rename use the new name; reads span old + new files
    t.append(Seq((3L, "c", 30.0)).toDF("id", "name", "total"))
    t.read().agg(sum("total")).as[Double].head() shouldBe 60.0
  }

  test("time travel reads the pre-rename schema") {
    val t = fresh("cm-tt")
    val v = t.version
    t.renameColumn("amount", "total")
    t.versionAsOf(v).schema.fieldNames.toSeq should contain("amount")
    t.versionAsOf(v).select("amount").as[Double].collect().sorted shouldBe Array(10.0, 20.0)
  }

  test("DROP COLUMN retires the id; a same-named successor reads NULL, not old bytes") {
    val t = fresh("cm-drop")
    val filesBefore = t.snapshot().files.map(_.path).toSet
    t.dropColumn("amount")
    t.snapshot().files.map(_.path).toSet shouldBe filesBefore
    t.schema.fieldNames.toSeq shouldBe Seq("id", "name")
    // re-add a column with the SAME name: fresh id -> old files read NULL
    t.addColumns(Seq(StructField("amount", DoubleType)))
    t.read().select("amount").as[Option[Double]].collect() shouldBe Array(None, None)
    // new writes fill it
    t.append(Seq((3L, "c", 99.0)).toDF("id", "name", "amount"))
    t.read().filter(col("id") === 3L).select("amount").as[Double].head() shouldBe 99.0
    // r13: the successor must NOT resolve the ORIGINAL column's stats —
    // per-file stats stay keyed 'amount' in the immutable log (old files
    // claim min 10 / max 20 / nullCount 0 for a column that is all-null
    // there). The reuse marker distrusts untagged files: exact
    // metadata-only answers refuse instead of being WRONG, healing as
    // data rewrites (the new file is tagged and trusted).
    graft.log.TypeWidening.nameReused(
      t.schema.fields.find(_.name == "amount").get) shouldBe true
    t.statsMinMax("amount") shouldBe None
    // after rewriting the old files the answer is exact again
    t.optimizeCompact()
    t.statsMinMax("amount") shouldBe Some((99.0, 99.0))
  }

  test("a RENAMED-away name is retired: a successor column carries the " +
    "reuse marker and never resolves the original's stats (r13)") {
    val t = fresh("cm-rename-reuse")
    t.renameColumn("amount", "total")
    // reusing 'amount' for a NEW column: allowed, marker stamped
    t.addColumns(Seq(StructField("amount", DoubleType)))
    t.read().select("amount").as[Option[Double]].collect() shouldBe Array(None, None)
    t.statsMinMax("amount") shouldBe None // old stats keyed 'amount' = total's bytes
    t.statsMinMax("total") match {
      case Some((mn, mx)) => (mn, mx) shouldBe ((10.0, 20.0))
      case None => () // conservative is acceptable; WRONG is not
    }
    // renaming BACK to a retired name is the revert of the SAME field:
    // allowed, and the name un-retires
    val t2 = fresh("cm-rename-revert")
    t2.renameColumn("amount", "total")
    t2.renameColumn("total", "amount")
    t2.statsMinMax("amount") shouldBe Some((10.0, 20.0)) // same id: stats valid
    // but renaming a DIFFERENT column onto a retired name refuses
    val t3 = fresh("cm-rename-steal")
    t3.renameColumn("amount", "total")
    intercept[IllegalArgumentException] {
      t3.renameColumn("name", "amount")
    }.getMessage should include("renamed away")
  }

  test("the retired-name ledger survives names carrying its old " +
    "delimiters (comma/colon/braces) — and still reads the legacy form") {
    // a column-mapped source may legally name columns with commas or
    // colons; the pre-r14 ','-joined 'name:id' ledger encoding corrupted
    // on them (StringIndexOutOfBounds on the next parse), permanently
    // wedging renames/drops/ADD COLUMN/sync on the table
    val weird = Map("a,b" -> 1L, "c:d:e" -> 2L, "{\"x\":1}" -> 3L, "plain" -> 4L)
    graft.log.ColumnIds.retiredNames(Map(
      graft.log.ColumnIds.RetiredNamesKey ->
        graft.log.ColumnIds.serializeRetired(weird))) shouldBe weird
    // legacy comma-format ledgers (committed before r14) still parse
    graft.log.ColumnIds.retiredNames(Map(
      graft.log.ColumnIds.RetiredNamesKey -> "amount:3,total:7")) shouldBe
      Map("amount" -> 3L, "total" -> 7L)
    // a LEGACY ledger whose first retired name begins with '{' must not
    // be mistaken for JSON (review r14): falls back to the legacy parse
    graft.log.ColumnIds.retiredNames(Map(
      graft.log.ColumnIds.RetiredNamesKey -> "{tags}:3,plain:7")) shouldBe
      Map("{tags}" -> 3L, "plain" -> 7L)
    // but a CORRUPT (truncated) JSON ledger must not silently legacy-parse
    // into a garbage name — it fails loudly (review r14, second pass)
    intercept[IllegalArgumentException] {
      graft.log.ColumnIds.retiredNames(Map(
        graft.log.ColumnIds.RetiredNamesKey -> "{\"a\":3"))
    }.getMessage should include("neither valid JSON")
    // end-to-end: rename a comma-bearing column away, reuse the name, and
    // the marker + ledger machinery keep working
    val t = LakeTable.createFrom(spark,
      tmpDir("cm-weird-name").resolve("t").toString,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "a,b"))
    t.renameColumn("a,b", "ab")
    t.addColumns(Seq(StructField("a,b", DoubleType)))
    graft.log.TypeWidening.nameReused(
      t.schema.fields.find(_.name == "a,b").get) shouldBe true
    t.statsMinMax("a,b") shouldBe None // old 'a,b'-keyed stats are ab's bytes
    t.renameColumn("ab", "plain") // the ledger keeps accepting updates
    graft.log.ColumnIds.retiredNames(t.properties)
      .keySet should contain allOf ("a,b", "ab")
  }

  test("rename of a partition column keeps pruning working for new writes") {
    val t = LakeTable.create(spark, tmpDir("cm-part").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("cat", StringType))),
      partitionColumns = Seq("cat"))
    t.append(Seq((1L, "x"), (2L, "y")).toDF("id", "cat"))
    t.renameColumn("cat", "category")
    t.partitionColumns shouldBe Seq("category")
    t.append(Seq((3L, "x"), (4L, "z")).toDF("id", "category"))
    t.read(Seq(col("category") === "x")).select("id").as[Long].collect().sorted shouldBe
      Array(1L, 3L)
  }

  test("rename blocked while a constraint or generated rule references the column") {
    val t = fresh("cm-blocked")
    t.addConstraint("positive_amount", "amount > 0")
    intercept[IllegalArgumentException] { t.renameColumn("amount", "total") }
    intercept[IllegalArgumentException] { t.dropColumn("amount") }
    t.dropConstraint("positive_amount")
    t.renameColumn("amount", "total")
    t.schema.fieldNames.toSeq should contain("total")
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN") {
    val t = fresh("cm-sql")
    val sql = GraftSql(spark)
    sql.run(s"ALTER TABLE '${t.dir}' RENAME COLUMN amount TO total")
    t.schema.fieldNames.toSeq shouldBe Seq("id", "name", "total")
    sql.run(s"ALTER TABLE '${t.dir}' DROP COLUMN name")
    t.schema.fieldNames.toSeq shouldBe Seq("id", "total")
    t.read().orderBy("id").select("total").as[Double].collect() shouldBe Array(10.0, 20.0)
  }

  test("DML and DV masking keep working across a rename") {
    val t = fresh("cm-dml")
    t.renameColumn("amount", "total")
    t.update(col("id") === 1L, Map("total" -> lit(11.0)))
    t.read().orderBy("id").select("total").as[Double].collect() shouldBe Array(11.0, 20.0)
    t.setProperties(Map("graft.enableDeletionVectors" -> "true"))
    t.delete(col("total") === 20.0)
    t.read().count() shouldBe 1
    t.merge(Seq((1L, "A", 100.0)).toDF("id", "name", "total"),
        col("target.id") === col("source.id"))
      .whenMatchedUpdateAll().execute()
    t.read().select("total").as[Double].head() shouldBe 100.0
  }
}
