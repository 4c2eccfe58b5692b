package graft.table

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Metadata-only aggregates: count / min / max answered from the tx-log
  * without launching a single Spark job — the Delta "metadata-only query"
  * optimization that turns a 100 TB `count(*)` into driver arithmetic. */
class MetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String, props: Map[String, String] = Map.empty) = {
    val dir = tmpDir(prefix).resolve("t").toString
    LakeTable.create(spark, dir,
      StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType),
        StructField("amount", DoubleType),
        StructField("note", StringType))),
      properties = props)
  }

  private def data(ids: Range) =
    ids.map(i => (i.toLong, s"name$i", i * 1.5,
      if (i % 2 == 0) null else s"note$i")).toDF("id", "name", "amount", "note")

  /** Count Spark jobs started while `body` runs. */
  private def jobsDuring(body: => Unit): Int = {
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val l = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(200) } // let any stray job-start events land
    finally spark.sparkContext.removeSparkListener(l)
    counter.get()
  }

  test("rowCount and statsMinMax match scan results with zero Spark jobs") {
    val t = freshTable("meta-agg")
    t.append(data(0 until 500))
    t.append(data(500 until 800))
    var cnt = -1L
    var idMm: Option[(Any, Any)] = None
    var amountMm: Option[(Any, Any)] = None
    var nameMm: Option[(Any, Any)] = None
    val jobs = jobsDuring {
      cnt = t.rowCount()
      idMm = t.statsMinMax("id")
      amountMm = t.statsMinMax("amount")
      nameMm = t.statsMinMax("name")
    }
    jobs shouldBe 0
    cnt shouldBe 800L
    idMm shouldBe Some((0L, 799L))
    amountMm shouldBe Some((0.0, 799 * 1.5))
    nameMm shouldBe Some(("name0", "name99")) // string order, not numeric
    val scan = t.read().agg(min("name"), max("name")).head()
    (scan.getString(0), scan.getString(1)) shouldBe (("name0", "name99"))
  }

  test("deletion vectors: rowCount stays exact, statsMinMax refuses") {
    val t = freshTable("meta-dv", Map("graft.enableDeletionVectors" -> "true"))
    t.append(data(0 until 300))
    t.delete(col("id") >= 250) // DV path: extreme rows masked, not rewritten
    t.rowCount() shouldBe 250L
    t.rowCount() shouldBe t.read().count()
    // the log alone cannot prove the max id is still live
    t.statsMinMax("id") shouldBe None
  }

  test("truncated string bounds and unknown/all-null columns refuse or degrade") {
    val t = freshTable("meta-trunc")
    val long = "x" * 200
    t.append(Seq((1L, long, 1.0, null: String)).toDF("id", "name", "amount", "note"))
    t.statsMinMax("name") shouldBe None // 200-char bound is truncated in the log
    t.statsMinMax("nope") shouldBe None // no such column
    t.statsMinMax("note") shouldBe Some((null, null)) // all-null column
    t.rowCount() shouldBe 1L
  }

  test("count(*) over a graft scan optimizes to a LocalRelation, zero jobs") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val t = freshTable("meta-rule")
    t.append(data(0 until 123))
    val agg = t.toDf.agg(count(lit(1)).as("n"))
    agg.queryExecution.optimizedPlan shouldBe a[LocalRelation]
    var got = -1L
    jobsDuring { got = agg.as[Long].head() } shouldBe 0
    got shouldBe 123L
    // SQL over a temp view takes the same path
    t.createOrReplaceTempView("meta_rule_v")
    spark.sql("SELECT count(*) AS n FROM meta_rule_v").as[Long].head() shouldBe 123L
  }

  test("min/max over a graft scan optimize to a LocalRelation, zero jobs") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val t = freshTable("meta-minmax")
    t.append(data(0 until 200))
    t.append(data(500 until 600))
    val agg = t.toDf.agg(
      min(col("id")).as("lo"), max(col("id")).as("hi"),
      max(col("name")).as("topname"), count(lit(1)).as("n"))
    agg.queryExecution.optimizedPlan shouldBe a[LocalRelation]
    var row: org.apache.spark.sql.Row = null
    jobsDuring { row = agg.head() } shouldBe 0
    (row.getLong(0), row.getLong(1), row.getString(2), row.getLong(3)) shouldBe
      ((0L, 599L, "name99", 300L))
  }

  test("min/max rule round-trips dates and timestamps exactly") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val dir = tmpDir("meta-ts").resolve("t").toString
    val rows = Seq(
      (java.sql.Date.valueOf("2021-03-05"), java.sql.Timestamp.valueOf("2021-03-05 01:02:03.004005")),
      (java.sql.Date.valueOf("2026-08-13"), java.sql.Timestamp.valueOf("2026-08-13 23:59:59.999999")),
      (java.sql.Date.valueOf("1969-12-31"), java.sql.Timestamp.valueOf("1969-12-31 23:00:00.0"))
    ).toDF("d", "ts")
    val t = LakeTable.createFrom(spark, dir, rows)
    val agg = t.toDf.agg(min(col("d")), max(col("d")), min(col("ts")), max(col("ts")))
    agg.queryExecution.optimizedPlan shouldBe a[LocalRelation]
    val r = agg.head()
    r.getDate(0) shouldBe java.sql.Date.valueOf("1969-12-31")
    r.getDate(1) shouldBe java.sql.Date.valueOf("2026-08-13")
    r.getTimestamp(2) shouldBe java.sql.Timestamp.valueOf("1969-12-31 23:00:00.0")
    r.getTimestamp(3) shouldBe java.sql.Timestamp.valueOf("2026-08-13 23:59:59.999999")
    // equals the scan answer
    val scan = t.read().agg(min(col("ts"))).head()
    scan.getTimestamp(0) shouldBe r.getTimestamp(2)
  }

  test("min/max rule round-trips timestamp_ntz exactly (r11: NTZ stats)") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val dir = tmpDir("meta-ntz").resolve("t").toString
    val rows = spark.range(3).select(expr(
      """CASE id WHEN 0 THEN timestamp_ntz'2021-03-05 01:02:03.004005'
                 WHEN 1 THEN timestamp_ntz'1969-12-31 23:00:00'
                 ELSE timestamp_ntz'2026-08-13 23:59:59.999999' END""").as("ts"))
    val t = LakeTable.createFrom(spark, dir, rows)
    // (the write above also lands one ZERO-ROW file — exactBounds must
    // skip it rather than refuse the whole answer)
    val agg = t.toDf.agg(min(col("ts")), max(col("ts")))
    agg.queryExecution.optimizedPlan shouldBe a[LocalRelation]
    val r = agg.head()
    r.getAs[java.time.LocalDateTime](0) shouldBe
      java.time.LocalDateTime.of(1969, 12, 31, 23, 0, 0)
    r.getAs[java.time.LocalDateTime](1) shouldBe
      java.time.LocalDateTime.of(2026, 8, 13, 23, 59, 59, 999999000)
    // equals the scan answer
    val scan = t.read().agg(min(col("ts")), max(col("ts"))).head()
    scan.getAs[java.time.LocalDateTime](0) shouldBe r.getAs[java.time.LocalDateTime](0)
    scan.getAs[java.time.LocalDateTime](1) shouldBe r.getAs[java.time.LocalDateTime](1)
  }

  test("metadata count rule leaves filtered / DV / count(col) plans alone") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val t = freshTable("meta-rule-neg", Map("graft.enableDeletionVectors" -> "true"))
    t.append(data(0 until 100))
    // WHERE blocks the rewrite and still answers correctly
    val filtered = t.toDf.filter(col("id") < 10).agg(count(lit(1)).as("n"))
    filtered.queryExecution.optimizedPlan should not be a[LocalRelation]
    filtered.as[Long].head() shouldBe 10L
    // count(col) is null-sensitive: note is null on even ids
    t.toDf.agg(count(col("note"))).as[Long].head() shouldBe 50L
    // min/max over a truncated string bound refuses (falls back to scan)
    val long = "z" * 200
    t.append(Seq((1000L, long, 1.0, null: String)).toDF("id", "name", "amount", "note"))
    val mm = t.toDf.agg(max(col("name")))
    mm.queryExecution.optimizedPlan should not be a[LocalRelation]
    mm.head().getString(0) shouldBe long
    // a DV table: count(*) stays metadata-only (totalRecords - masks,
    // exact from the snapshot); min/max refuse (the masked rows held the
    // extremes) and fall back to a scan that excludes them
    t.delete(col("id") >= 90)
    val masked = t.toDf.agg(count(lit(1)).as("n"))
    masked.queryExecution.optimizedPlan shouldBe a[LocalRelation]
    masked.as[Long].head() shouldBe 90L // ids 0..89; >= 90 (incl. 1000) masked
    val maskedMax = t.toDf.agg(max(col("id")))
    maskedMax.queryExecution.optimizedPlan should not be a[LocalRelation]
    maskedMax.head().getLong(0) shouldBe 89L
  }

  test("non-finite double bounds refuse the rewrite and fall back to scan") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val t = freshTable("meta-nan")
    t.append(data(0 until 10))
    t.append(Seq((100L, "inf", Double.PositiveInfinity, null: String))
      .toDF("id", "name", "amount", "note"))
    val mm = t.toDf.agg(min(col("amount")), max(col("amount")))
    mm.queryExecution.optimizedPlan should not be a[LocalRelation]
    val r = mm.head() // must not throw inside the optimizer
    r.getDouble(0) shouldBe 0.0
    r.getDouble(1).isPosInfinity shouldBe true
    t.statsMinMax("amount") shouldBe None
  }

  test("rewrite DML keeps metadata aggregates exact (no DVs involved)") {
    val t = freshTable("meta-dml")
    t.append(data(0 until 100))
    t.delete(col("id") >= 90) // rewrite path: files replaced, stats fresh
    t.rowCount() shouldBe 90L
    t.statsMinMax("id") shouldBe Some((0L, 89L))
  }
}
