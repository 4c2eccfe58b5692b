package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Generated columns (Delta's GENERATED ALWAYS AS): declared as
  * `graft.generated.<col>` rules, computed in `align` when a writer omits
  * the column, and validated by an implicit null-safe-equality check riding
  * the write job when a writer supplies it. */
class GeneratedColumnSpec extends SparkSpec {
  import spark.implicits._

  test("omitted generated column is computed on append") {
    val t = LakeTable.create(spark, tmpDir("gen-fill").resolve("t").toString,
      StructType(Seq(
        StructField("id", LongType), StructField("ts", TimestampType),
        StructField("day", DateType))),
      properties = Map("graft.generated.day" -> "CAST(ts AS DATE)"))
    t.append(Seq((1L, java.sql.Timestamp.valueOf("2024-03-05 10:30:00")))
      .toDF("id", "ts"))
    t.read().select("day").as[java.sql.Date].head() shouldBe
      java.sql.Date.valueOf("2024-03-05")
  }

  test("UPDATE of a base column recomputes dependent generated columns") {
    for (dv <- Seq(false, true)) {
      val t = LakeTable.create(spark,
        tmpDir(s"gen-upd-$dv").resolve("t").toString,
        StructType(Seq(
          StructField("id", LongType), StructField("n", LongType),
          StructField("n2", LongType))),
        properties = Map("graft.generated.n2" -> "n * 2",
          "graft.enableDeletionVectors" -> dv.toString))
      t.append(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "n"))
      // SET uses the OLD n (n + 5): recompute must see the NEW value
      t.update(col("id") <= 2, Map("n" -> (col("n") + 5)))
      val got = t.read().orderBy("id").as[(Long, Long, Long)].collect().toSeq
      withClue(s"dv=$dv: ") {
        got shouldBe Seq((1L, 15L, 30L), (2L, 25L, 50L), (3L, 30L, 60L))
      }
      // a pre-rule NULL row converges to the rule when its base updates
      val t2 = LakeTable.createFrom(spark,
        tmpDir(s"gen-conv-$dv").resolve("t").toString,
        Seq((9L, 4L)).toDF("id", "n"))
      t2.addGeneratedColumn("n2", LongType, "n * 2")
      t2.update(col("id") === 9L, Map("n" -> lit(6L)))
      t2.read().select("n", "n2").as[(Long, Option[Long])].head() shouldBe ((6L, Some(12L)))
      // an explicit SET of the generated column stays caller-owned:
      // an inconsistent value is rejected by the write-time check
      intercept[Exception] {
        t.update(col("id") === 3, Map("n" -> lit(7L), "n2" -> lit(999L)))
      }
    }
  }

  test("MERGE INSERT computes generated rules over a defaulted base column") {
    // n carries a DEFAULT; the generated rule reads n. An INSERT omitting n
    // writes n=5 via the default — the recompute must see 5, not NULL:
    // a null-propagating rule would otherwise silently stamp NULL, and a
    // coalesce-style rule would stamp rule(NULL) and abort on the identity
    // check against the row actually written.
    for (rule <- Seq("n * 2", "coalesce(n, 0) * 2")) {
      val t = LakeTable.create(spark,
        tmpDir("gen-merge-def").resolve("t").toString,
        StructType(Seq(
          StructField("id", LongType), StructField("n", LongType),
          StructField("n2", LongType))),
        properties = Map("graft.generated.n2" -> rule))
      t.setColumnDefault("n", Some("5"))
      t.append(Seq((1L, 10L)).toDF("id", "n"))
      t.merge(Seq(Tuple1(2L)).toDF("id"), col("target.id") === col("source.id"))
        .whenNotMatchedInsert(Map("id" -> col("source.id")))
        .execute()
      withClue(s"rule=$rule: ") {
        t.read().orderBy("id").select("id", "n", "n2")
          .as[(Long, Long, Long)].collect().toSeq shouldBe
          Seq((1L, 10L, 20L), (2L, 5L, 10L))
      }
    }
  }

  test("identity columns cannot be updated") {
    val t = LakeTable.create(spark, tmpDir("ident-upd").resolve("t").toString,
      StructType(Seq(StructField("k", LongType), StructField("v", LongType))),
      properties = Map("graft.identity.k" -> "1,1"))
    t.append(Seq(Tuple1(10L), Tuple1(20L)).toDF("v"))
    val e = intercept[IllegalArgumentException] {
      t.update(col("v") === 10L, Map("k" -> lit(99L)))
    }
    e.getMessage should include("IDENTITY")
  }

  test("supplied generated column is validated; wrong values fail before commit") {
    val t = LakeTable.create(spark, tmpDir("gen-val").resolve("t").toString,
      StructType(Seq(
        StructField("id", LongType), StructField("n", LongType),
        StructField("n2", LongType))),
      properties = Map("graft.generated.n2" -> "n * 2"))
    t.append(Seq((1L, 5L, 10L)).toDF("id", "n", "n2")) // correct value OK
    val vBefore = t.version
    intercept[IllegalArgumentException] {
      t.append(Seq((2L, 5L, 11L)).toDF("id", "n", "n2"))
    }
    t.version shouldBe vBefore
    t.read().count() shouldBe 1
  }

  test("addGeneratedColumn: column + rule in one commit; old rows stay NULL") {
    val t = LakeTable.createFrom(spark, tmpDir("gen-add").resolve("t").toString,
      Seq((1L, 4L)).toDF("id", "n"))
    t.addGeneratedColumn("n2", LongType, "n * 2")
    // pre-rule row reads NULL and still flows through DML; updating its
    // BASE column converges it to the live rule (rows the DML never
    // touches keep their NULL exemption)
    t.read().select("n2").as[Option[Long]].head() shouldBe None
    t.update(col("id") === 1L, Map("n" -> lit(7L)))
    t.read().select("n", "n2").as[(Long, Option[Long])].head() shouldBe ((7L, Some(14L)))
    // new writers get the computed value
    t.append(Seq((2L, 10L)).toDF("id", "n"))
    t.read().filter(col("id") === 2L).select("n2").as[Option[Long]].head() shouldBe Some(20L)
  }

  test("generated partition column prunes files") {
    val t = LakeTable.create(spark, tmpDir("gen-part").resolve("t").toString,
      StructType(Seq(
        StructField("id", LongType), StructField("ts", TimestampType),
        StructField("day", DateType))),
      partitionColumns = Seq("day"),
      properties = Map("graft.generated.day" -> "CAST(ts AS DATE)"))
    (1 to 3).foreach { d =>
      t.append((1 to 50).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-03-0$d 01:00:00")))
        .toDF("id", "ts"))
    }
    val snap = t.snapshot()
    snap.numFiles.toLong should be >= 3L
    val kept = t.read(Seq(col("day") === java.sql.Date.valueOf("2024-03-02")))
    kept.inputFiles.length.toLong should be < snap.numFiles.toLong
    kept.count() shouldBe 50
  }
}
