package graft.log

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable

/** Soundness fuzzing for driver-side file skipping: for ANY predicate, a
  * pruned read must return exactly the rows of a full scan + filter. A
  * pruner bug silently drops data, so this is correctness-critical.
  */
class PrunerSoundnessSpec extends SparkSpec {
  import spark.implicits._

  private lazy val table: LakeTable = {
    val rows = (0 until 400).map { i =>
      (i.toLong,
        if (i % 37 == 0) null else s"name_${i % 50}",
        (i % 97).toDouble / 3.0,
        java.sql.Date.valueOf(f"2024-${i % 12 + 1}%02d-${i % 27 + 1}%02d"),
        new java.math.BigDecimal(f"${i * 7}%d.${i % 100}%02d"))
    }
    val df = rows.toDF("id", "name", "score", "day", "amount")
      .withColumn("amount", col("amount").cast("decimal(18,2)"))
      // timestamp_ntz, monotone with id: disjoint per-file ranges so NTZ
      // stats can actually skip files (r11: NTZ became a stats type)
      .withColumn("ts", expr(
        "timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(id as int),0,0)"))
    val t = LakeTable.create(spark, tmpDir("pruner-fuzz").resolve("t").toString, df.schema)
    // many small files with DISJOINT id ranges -> real pruning happens
    (0 until 8).foreach(b => t.append(
      df.filter(col("id") >= b * 50L && col("id") < (b + 1) * 50L).coalesce(1)))
    t
  }

  private val predicates: Seq[(String, Column)] = Seq(
    "id point" -> (col("id") === 123L),
    "id range" -> (col("id") > 350L),
    "id range both" -> (col("id") >= 17L && col("id") < 46L),
    "reversed literal" -> (lit(200L) <= col("id")),
    "name eq" -> (col("name") === "name_7"),
    "name startswith" -> col("name").startsWith("name_4"),
    "name null" -> col("name").isNull,
    "name notnull" -> col("name").isNotNull,
    "double range" -> (col("score") < 3.5),
    "date eq" -> (col("day") === java.sql.Date.valueOf("2024-03-04")),
    "date range" -> (col("day") >= java.sql.Date.valueOf("2024-10-01")),
    "decimal range" -> (col("amount") > new java.math.BigDecimal("2000")),
    "in list" -> col("id").isin(1L, 99L, 256L, 9999L),
    "conjunction" -> (col("id") > 100L && col("name") === "name_13"),
    "disjunction" -> (col("id") < 5L || col("id") > 395L),
    "negation" -> !(col("id") < 390L),
    "cross-column" -> (col("score") > 20.0 && col("day") < java.sql.Date.valueOf("2024-06-01")),
    "no match" -> (col("id") === -1L),
    "tautology" -> (col("id") >= 0L),
    // id=123 -> +123h = 2024-01-06 03:00
    "ntz point" -> (col("ts") === expr("timestamp_ntz'2024-01-06 03:00:00'")),
    "ntz range" -> (col("ts") >= expr("timestamp_ntz'2024-01-11 00:00:00'")),
    "ntz cross" -> (col("ts") < expr("timestamp_ntz'2024-01-03 00:00:00'") && col("score") > 1.0))

  test("pruned reads equal full-scan-plus-filter for every predicate shape") {
    val full = table.read()
    predicates.foreach { case (label, pred) =>
      val pruned = table.read(Seq(pred)).orderBy("id").collect()
      val expected = full.filter(pred).orderBy("id").collect()
      withClue(s"[$label] ") { pruned shouldBe expected }
    }
  }

  test("pruning actually skips files for selective predicates") {
    val snap = table.snapshot()
    snap.numFiles should be >= 8
    val kept = Pruner.prune(snap.files, Seq(col("id") === 123L), snap.schema)
    kept.size should be < snap.numFiles
    // NTZ stats skip too: the ts ranges are disjoint per file by design
    val keptNtz = Pruner.prune(snap.files,
      Seq(col("ts") === expr("timestamp_ntz'2024-01-06 03:00:00'")), snap.schema)
    keptNtz.size should be < snap.numFiles
  }

  test("soundness holds after zorder rewrites the layout") {
    table.optimizeZOrder(Seq("score", "day"), targetFileSize = 8 * 1024)
    val full = table.read()
    predicates.foreach { case (label, pred) =>
      val pruned = table.read(Seq(pred)).orderBy("id").collect()
      val expected = full.filter(pred).orderBy("id").collect()
      withClue(s"[post-zorder $label] ") { pruned shouldBe expected }
    }
  }
}
