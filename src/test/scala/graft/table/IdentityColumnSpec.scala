package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Identity columns (Delta's GENERATED ALWAYS AS IDENTITY): allocated on
  * append when omitted, supplying a value errors, values are unique and
  * advance monotonically across appends (gaps allowed, as in Delta). */
class IdentityColumnSpec extends SparkSpec {
  import spark.implicits._

  test("identity values are unique, monotone across appends, and respect start/step") {
    val t = LakeTable.create(spark, tmpDir("idc").resolve("t").toString,
      StructType(Seq(StructField("rid", LongType), StructField("v", StringType))),
      properties = Map("graft.identity.rid" -> "100,10"))
    t.append(Seq("a", "b", "c").toDF("v"))
    val first = t.read().select("rid").as[Long].collect()
    first.distinct.length shouldBe 3
    first.min shouldBe 100L // start honored
    all(first.map(r => (r - 100) % 10)) shouldBe 0L // step honored
    t.append(Seq("d", "e").toDF("v"))
    val all5 = t.read().select("rid").as[Long].collect()
    all5.distinct.length shouldBe 5
    // second batch strictly above the first (high-water advanced)
    all5.sorted.takeRight(2).min should be > first.max
  }

  test("supplying an identity value errors (GENERATED ALWAYS)") {
    val t = LakeTable.create(spark, tmpDir("idc-supply").resolve("t").toString,
      StructType(Seq(StructField("rid", LongType), StructField("v", StringType))),
      properties = Map("graft.identity.rid" -> "1,1"))
    intercept[IllegalArgumentException] {
      t.append(Seq((5L, "x")).toDF("rid", "v"))
    }
  }

  test("addIdentityColumn on an existing table: old rows NULL, new appends allocated") {
    val t = LakeTable.createFrom(spark, tmpDir("idc-add").resolve("t").toString,
      Seq("a", "b").toDF("v"))
    t.addIdentityColumn("rid", start = 7L, step = 3L)
    t.read().select("rid").as[Option[Long]].collect() shouldBe Array(None, None)
    t.append(Seq("c").toDF("v"))
    val got = t.read().filter(col("rid").isNotNull).select("rid").as[Long].collect()
    got.length shouldBe 1
    got.head shouldBe 7L
  }
}
