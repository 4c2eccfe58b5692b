package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQL-string surface parity (W9): the reference drives silver re-inserts
  * and ad-hoc analytics through `spark.sql` over temp views
  * (notebooks/02_silver_transformation.py:123-130, src/delta_utils.py:99-102);
  * a LakeTable registers as a temp view and a whole pipeline runs in SQL.
  * Also exercises the remaining unwrapped builtins: describe() (A10) and
  * toDF(names) (P8).
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): LakeTable =
    LakeTable.createFrom(spark, tmpDir(name).resolve("t").toString,
      (1 to 100).map(i => (i.toLong, s"u${i % 7}", i * 1.5, if (i % 2 == 0) "F" else "O"))
        .toDF("id", "user", "amount", "status"))

  test("temp view + spark.sql pipeline matches the DataFrame API result (W9)") {
    val t = freshTable("sql-view")
    t.createOrReplaceTempView("orders_v")
    val sql = spark.sql(
      """SELECT user, count(*) AS n, round(sum(amount), 2) AS total
         FROM orders_v WHERE status = 'F' GROUP BY user ORDER BY user""")
    val api = t.read(Seq(col("status") === "F"))
      .groupBy("user").agg(count(lit(1)).as("n"), round(sum("amount"), 2).as("total"))
      .orderBy("user")
    sql.collect() shouldBe api.collect()
  }

  test("temp view re-registration sees table writes") {
    val t = freshTable("sql-view2")
    t.createOrReplaceTempView("v2")
    spark.sql("SELECT count(*) FROM v2").as[Long].head() shouldBe 100
    t.append(Seq((101L, "u0", 1.0, "F")).toDF("id", "user", "amount", "status"))
    t.createOrReplaceTempView("v2")
    spark.sql("SELECT count(*) FROM v2").as[Long].head() shouldBe 101
    // SQL drives a DML round-trip: compute doomed keys in SQL, delete via API
    val doomed = spark.sql("SELECT id FROM v2 WHERE amount > 149").as[Long].collect()
    t.delete(col("id").isInCollection(doomed.toSeq))
    t.read().count() shouldBe 101 - doomed.length
  }

  test("describe() summarizes numeric columns (A10)") {
    val d = freshTable("sql-desc").toDf.describe("amount")
    val stats = d.select("summary").as[String].collect().toSet
    stats shouldBe Set("count", "mean", "stddev", "min", "max")
    d.filter(col("summary") === "count").select("amount").as[String].head() shouldBe "100"
  }

  test("toDF(names) renames all columns (P8)") {
    val renamed = freshTable("sql-todf").toDf.toDF("k", "who", "amt", "st")
    renamed.columns shouldBe Array("k", "who", "amt", "st")
    renamed.agg(sum("k")).as[Long].head() shouldBe (1 to 100).sum.toLong
  }
}
