package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Complex-typed columns (map/array/struct — e.g. the reference's
  * MapType(String,String) event properties) through every table-format
  * path: append, DML rewrite, merge, CDF, time travel. Footer stats for
  * these columns are absent by design; pruning must stay conservative.
  */
class ComplexTypesSpec extends SparkSpec {
  import spark.implicits._

  case class Evt(id: Long, props: Map[String, String], tags: Seq[Int], who: (String, Int))

  private def df(rows: (Long, Map[String, String], Seq[Int], (String, Int))*) =
    rows.toDF("id", "props", "tags", "who")

  test("append/read/time-travel round-trip map, array, and struct columns") {
    val t = LakeTable.createFrom(spark, tmpDir("cx").resolve("t").toString,
      df((1L, Map("a" -> "1"), Seq(1, 2), ("n1", 10)),
         (2L, Map("b" -> "2", "c" -> "3"), Seq.empty[Int], ("n2", 20))))
    t.append(df((3L, Map.empty[String, String], Seq(9), ("n3", 30))))
    t.read().count() shouldBe 3
    val r = t.read().filter(col("id") === 2L).collect().head
    r.getAs[Map[String, String]]("props") shouldBe Map("b" -> "2", "c" -> "3")
    t.versionAsOf(1).count() shouldBe 2
    // stats exist for the primitive column, none for complex ones
    val f = t.snapshot().files.head
    f.stats.contains("id") shouldBe true
    f.stats.get("props").foreach(s => Option(s.min) shouldBe None)
  }

  test("UPDATE and MERGE rewrite complex columns correctly") {
    val t = LakeTable.createFrom(spark, tmpDir("cx2").resolve("t").toString,
      df((1L, Map("k" -> "old"), Seq(1), ("a", 1)),
         (2L, Map("k" -> "keep"), Seq(2), ("b", 2))))
    t.update(col("id") === 1L, Map("props" -> map(lit("k"), lit("new"))))
    t.read().filter(col("id") === 1L).select(element_at(col("props"), "k"))
      .as[String].head() shouldBe "new"

    val src = df((2L, Map("k" -> "merged"), Seq(7, 8), ("b2", 22)),
                 (9L, Map("fresh" -> "y"), Seq(9), ("i", 9)))
    t.merge(src, col("target.id") === col("source.id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val out = t.read().orderBy("id").collect()
    out.length shouldBe 3
    out(1).getAs[Seq[Int]]("tags") shouldBe Seq(7, 8)
    out(2).getAs[Map[String, String]]("props") shouldBe Map("fresh" -> "y")
  }

  test("CDF carries complex columns through update pre/post images") {
    val t = LakeTable.createFrom(spark, tmpDir("cx3").resolve("t").toString,
      df((1L, Map("s" -> "v0"), Seq(1), ("x", 1))),
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    val v = t.version
    t.update(col("id") === 1L, Map("props" -> map(lit("s"), lit("v1"))))
    val ch = t.changes(v + 1).orderBy("_change_type").collect()
    ch.map(_.getAs[String]("_change_type")).toSeq shouldBe
      Seq("update_postimage", "update_preimage")
    ch.head.getAs[Map[String, String]]("props") shouldBe Map("s" -> "v1")
    ch.last.getAs[Map[String, String]]("props") shouldBe Map("s" -> "v0")
  }
}
