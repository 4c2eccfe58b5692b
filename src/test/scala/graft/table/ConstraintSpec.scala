package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CHECK-constraint enforcement (Delta's ALTER TABLE ADD CONSTRAINT ...
  * CHECK parity). Constraints are validated as observed metrics riding the
  * write job itself — no second pass — and a violating batch fails before
  * its commit, so readers never observe bad rows. */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): LakeTable =
    LakeTable.createFrom(spark, tmpDir(name).resolve("t").toString,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "amount"))

  test("adding a constraint validates existing rows first") {
    val t = fresh("ct-add")
    t.addConstraint("positive_amount", "amount > 0")
    t.properties("graft.constraints.positive_amount") shouldBe "amount > 0"
    intercept[IllegalArgumentException] {
      t.addConstraint("big_amount", "amount > 15")
    }
  }

  test("append violating a constraint fails before commit; table unchanged") {
    val t = fresh("ct-append")
    t.addConstraint("positive_amount", "amount > 0")
    val vBefore = t.version
    intercept[IllegalArgumentException] {
      t.append(Seq((3L, "c", -5.0)).toDF("id", "name", "amount"))
    }
    t.version shouldBe vBefore
    t.read().count() shouldBe 2
    // valid rows still land
    t.append(Seq((3L, "c", 5.0)).toDF("id", "name", "amount"))
    t.read().count() shouldBe 3
  }

  test("NULL constraint result counts as a violation (Delta semantics)") {
    val t = fresh("ct-null")
    t.addConstraint("named", "name IS NOT NULL")
    intercept[IllegalArgumentException] {
      t.append(Seq((4L, null.asInstanceOf[String], 1.0)).toDF("id", "name", "amount"))
    }
    // amount > 0 evaluates to NULL for a null amount -> violation
    val t2 = fresh("ct-null2")
    t2.addConstraint("positive_amount", "amount > 0")
    intercept[IllegalArgumentException] {
      t2.append(Seq((4L, "d", null.asInstanceOf[java.lang.Double]))
        .toDF("id", "name", "amount").withColumn("amount", col("amount").cast("double")))
    }
  }

  test("UPDATE producing a violating row fails; dropConstraint lifts enforcement") {
    val t = fresh("ct-update")
    t.addConstraint("positive_amount", "amount > 0")
    intercept[IllegalArgumentException] {
      t.update(col("id") === 1L, Map("amount" -> lit(-1.0)))
    }
    t.read().filter(col("amount") < 0).count() shouldBe 0
    t.dropConstraint("positive_amount")
    t.update(col("id") === 1L, Map("amount" -> lit(-1.0)))
    t.read().filter(col("amount") < 0).count() shouldBe 1
  }

  test("MERGE insert enforcement + SQL ADD/DROP CONSTRAINT surface") {
    val t = fresh("ct-sql")
    val sql = GraftSql(spark)
    sql.run(s"ALTER TABLE '${t.dir}' ADD CONSTRAINT amount_cap CHECK (amount < 100)")
    t.properties.contains("graft.constraints.amount_cap") shouldBe true
    intercept[IllegalArgumentException] {
      t.merge(Seq((9L, "z", 500.0)).toDF("id", "name", "amount"),
          col("target.id") === col("source.id"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    }
    t.read().count() shouldBe 2
    sql.run(s"ALTER TABLE '${t.dir}' DROP CONSTRAINT amount_cap")
    t.properties.contains("graft.constraints.amount_cap") shouldBe false
  }
}
