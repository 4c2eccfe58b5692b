package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The Catalyst-integrated scan path: filters applied on `toDf` (or through
  * SQL over a temp view) must reach GraftFileIndex.listFiles and skip files
  * using the log's footer stats — planning-time pruning with no explicit
  * `read(filters)` call. */
class CatalystScanSpec extends SparkSpec {
  import spark.implicits._

  private def scannedFiles(df: DataFrame): Long = {
    df.collect() // metrics populate on execution
    // AQE roots and materialized query stages are leaf nodes hiding their
    // actual plans — descend explicitly
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  private def rangedTable(name: String): LakeTable = {
    val t = LakeTable.create(spark, tmpDir(name).resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
    // 4 appends with disjoint id ranges -> 4 files with disjoint [min,max]
    (0 until 4).foreach { i =>
      t.append(Seq.tabulate(100)(j => (i * 100L + j, s"v$i-$j")).toDF("id", "v").coalesce(1))
    }
    t
  }

  test("toDf.filter prunes files at planning time via the log stats") {
    val t = rangedTable("cscan")
    t.snapshot().numFiles shouldBe 4
    val hit = t.toDf.filter(col("id") === 150L)
    hit.as[(Long, String)].collect() shouldBe Array((150L, "v1-50"))
    scannedFiles(hit) shouldBe 1
    val range = t.toDf.filter(col("id") >= 100L && col("id") < 300L)
    range.count() shouldBe 200
    scannedFiles(range) shouldBe 2
    // unfiltered scan reads everything
    scannedFiles(t.toDf) shouldBe 4
    t.toDf.count() shouldBe 400
  }

  test("SQL over a temp view gets the same pruning") {
    val t = rangedTable("csql")
    t.createOrReplaceTempView("cscan_sql")
    val q = spark.sql("SELECT count(*) AS n FROM cscan_sql WHERE id < 100")
    q.as[Long].head() shouldBe 100
    scannedFiles(q) shouldBe 1
  }

  test("partition-column filters prune through the same index") {
    val t = LakeTable.create(spark, tmpDir("cpart").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("p", StringType))),
      partitionColumns = Seq("p"))
    t.append(spark.range(300).select(col("id"), concat(lit("p"), col("id") % 3).as("p")))
    val files = t.snapshot().numFiles
    files should be >= 3
    val one = t.toDf.filter(col("p") === "p1")
    one.count() shouldBe 100
    scannedFiles(one) should be < files.toLong
  }

  test("scan matches read() and stays a consistent snapshot under later writes") {
    val t = rangedTable("csnap")
    val df = t.toDf
    t.read().orderBy("id").collect() shouldBe df.orderBy("id").collect()
    t.append(Seq((999L, "late")).toDF("id", "v"))
    // the captured scan still sees the old file set; a fresh one sees the new row
    df.count() shouldBe 400
    t.toDf.count() shouldBe 401
  }

  test("scan equals the eager read under randomized filters (soundness fuzz)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(600) { i =>
      (i.toLong,
        if (rnd.nextInt(10) == 0) null else s"k${rnd.nextInt(40)}",
        rnd.nextInt(1000))
    }
    val t = LakeTable.create(spark, tmpDir("cfuzz").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("s", StringType),
        StructField("n", IntegerType))))
    rows.grouped(100).foreach(g => t.append(g.toDF("id", "s", "n").coalesce(1)))
    val eager = t.read()
    val preds = Seq(
      col("id") === 123L, col("id") > 450L, col("n") <= 77,
      col("s") === "k7", col("s").isNull, col("s").isNotNull,
      col("n").isin(5, 55, 555), col("s").startsWith("k1"),
      col("id") > 100L && col("n") < 500, col("s") === "k3" || col("n") > 900,
      !(col("n") === 4), col("id") % 7 === 0)
    preds.foreach { p =>
      withClue(s"predicate $p: ") {
        t.toDf.filter(p).count() shouldBe eager.filter(p).count()
      }
    }
  }

  test("deletion-vector tables keep plan-time pruning under the mask join") {
    val t = rangedTable("cdv")
    t.setProperties(Map("graft.enableDeletionVectors" -> "true"))
    t.delete(col("id") === 150L)
    t.toDf.count() shouldBe 399
    t.toDf.filter(col("id") === 150L).count() shouldBe 0
    // the filter pushes through the bitmap mask filter into the pruned
    // scan: 1 data file (the DV bitmaps ride a plan-time broadcast, not
    // the query DAG), vs all 4 data files unfiltered
    val hit = t.toDf.filter(col("id") === 250L)
    hit.count() shouldBe 1
    scannedFiles(hit) shouldBe 1
    scannedFiles(t.toDf) shouldBe 4
  }
}
