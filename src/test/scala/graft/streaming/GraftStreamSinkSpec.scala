package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.GraftCatalog
import graft.table.LakeTable

/** Streaming-write surface: `writeStream.format("graft").start(path)` and
  * `writeStream.toTable("cat.ns.t")` (the reference's primary streaming
  * spelling, src/data_processor.py:191-197) — exactly-once, append and
  * complete modes, table auto-create. */
class GraftStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("format(graft) sink: append mode, auto-create, exactly-once ledger") {
    val dir = tmpDir("gsink-a").resolve("t").toString
    val ckpt = tmpDir("gsink-a-ck").toString
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(dir)
    in.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    in.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    val t = LakeTable.forPath(spark, dir)
    t.read().count() shouldBe 3
    // ledger carries the query id + epochs; both commits are STREAMING UPDATE
    val commits = t.history(None)
      .filter(col("operation") === "STREAMING UPDATE").count()
    commits shouldBe 2L

    // restart from the same checkpoint: the replacement stream replays the
    // same block structure (MemoryStream offsets count addData blocks);
    // committed blocks are not re-emitted, the new block lands
    val in2 = MemoryStream[(Long, String)]
    in2.addData((1L, "a"), (2L, "b"))
    in2.addData((3L, "c"))
    in2.addData((4L, "d"))
    val q2 = in2.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(dir)
    q2.processAllAvailable()
    q2.stop()
    t.read().count() shouldBe 4
  }

  test("complete mode: each epoch idempotently overwrites the aggregate") {
    val dir = tmpDir("gsink-c").resolve("t").toString
    val ckpt = tmpDir("gsink-c-ck").toString
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("id")
      .groupBy((col("id") % 2).as("k")).agg(count(lit(1)).as("n"))
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .start(dir)
    in.addData(1L, 2L, 3L)
    q.processAllAvailable()
    in.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    val rows = LakeTable.forPath(spark, dir).read()
      .orderBy("k").as[(Long, Long)].collect()
    rows shouldBe Array((0L, 2L), (1L, 3L)) // counts over ALL 5 ids, not the last batch
  }

  test("update mode is rejected with a pointer to foreachBatch + MERGE") {
    val dir = tmpDir("gsink-u").resolve("t").toString
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("id")
      .groupBy(col("id")).agg(count(lit(1)).as("n"))
      .writeStream.format("graft")
      .option("checkpointLocation", tmpDir("gsink-u-ck").toString)
      .outputMode("update")
      .start(dir)
    in.addData(1L)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    ex.getMessage should include("foreachBatch")
    q.stop()
  }

  test("writeStream.toTable on a catalog table routes through the V1 fallback") {
    val warehouse = tmpDir("gsink-wh").toString
    spark.conf.set("spark.sql.catalog.gsk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsk.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsk.bronze")
    spark.sql("CREATE TABLE gsk.bronze.clicks (id BIGINT, v STRING) USING graft")
    val in = MemoryStream[(Long, String)]
    // the reference's exact spelling: .writeStream.format("delta")…
    // .toTable(name) (src/data_processor.py:191-197)
    val q = in.toDF().toDF("id", "v")
      .writeStream.format("graft")
      .option("checkpointLocation", tmpDir("gsink-t-ck").toString)
      .toTable("gsk.bronze.clicks")
    in.addData((10L, "x"), (11L, "y"))
    q.processAllAvailable()
    q.stop()
    // visible through BOTH the catalog read path and the native table
    spark.table("gsk.bronze.clicks").count() shouldBe 2
    spark.sql("SELECT count(*) FROM gsk.bronze.clicks WHERE id = 10")
      .as[Long].head() shouldBe 1L
  }
}
