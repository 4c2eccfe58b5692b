package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DML on tables whose on-disk paths need URL encoding: a table directory
  * containing a space plus hive-escaped partition values (space, '=', ':',
  * '%'). `input_file_name()` returns URL-encoded URIs, so the probe-phase
  * file matching must decode exactly once — a miss here makes UPDATE/DELETE
  * silently skip files and MERGE insert duplicates instead of updating.
  */
class EscapedPathsSpec extends SparkSpec {
  import spark.implicits._

  private val cats = Seq("a b", "x=y", "p%q", "c:d")

  private def freshTable(name: String): LakeTable = {
    val df = (0 until 400).map(i => (i.toLong, cats(i % 4), i * 10L))
      .toDF("id", "cat", "v")
    val dir = tmpDir(name).resolve("t dir").toString
    val t = LakeTable.create(spark, dir, df.schema, partitionColumns = Seq("cat"))
    // several appends => >2 files per partition, so the DML probe runs
    (0 until 4).foreach(k => t.append(df.filter(col("id") % 4 === k)))
    t
  }

  test("UPDATE matches files under escaped partition dirs") {
    val t = freshTable("esc-upd")
    t.snapshot().numFiles should be > 2
    t.update(col("v") < 1000L, Map("v" -> lit(-1L)))
    t.read().filter(col("v") === -1L).count() shouldBe 100
    t.read().filter(col("v") < 1000L && col("v") =!= -1L).count() shouldBe 0
  }

  test("DELETE matches files under escaped partition dirs") {
    val t = freshTable("esc-del")
    t.delete(col("id") < 100L)
    t.read().count() shouldBe 300
    t.read().filter(col("id") < 100L).count() shouldBe 0
  }

  test("MERGE updates (not duplicates) rows under escaped partition dirs") {
    val t = freshTable("esc-mrg")
    val src = (50 until 150).map(i => (i.toLong, cats(i % 4), -5L)).toDF("id", "cat", "v")
    t.merge(src, col("target.id") === col("source.id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    t.read().count() shouldBe 400 // all matched -> no inserts, no duplicates
    t.read().filter(col("v") === -5L).count() shouldBe 100
  }

  test("stats survive the round trip for escaped paths (numRecords > 0)") {
    val t = freshTable("esc-stats")
    t.snapshot().files.foreach { f => f.numRecords should be > 0L }
  }

  test("the FileIndex scan path resolves escaped paths (toDf + filter)") {
    val t = freshTable("esc-scan")
    t.toDf.count() shouldBe 400
    t.toDf.filter(col("cat") === "x=y").count() shouldBe 100
    t.toDf.filter(col("id") === 7L).count() shouldBe 1
  }
}
