package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.log.Pruner

/** graft.clusterBy — clustered ingest (liquid-clustering-lite): appends are
  * z-range-partitioned + sorted at write time, so fresh files prune for
  * point/range predicates without an OPTIMIZE ZORDER pass. */
class ClusteredWriteSpec extends SparkSpec {
  import spark.implicits._

  test("clusterBy z-clusters appends; point predicates prune fresh files") {
    val t = LakeTable.create(spark, tmpDir("clusterby").resolve("t").toString,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      properties = Map(
        "graft.clusterBy" -> "id",
        "graft.targetFileSize" -> "65536"))
    // shuffled ids: raw arrival order has no locality to exploit
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((1L to 60000L).toList)
    t.append(spark.createDataset(rows).toDF("id")
      .withColumn("v", concat(lit("val_"), col("id"))))
    val snap = t.snapshot()
    withClue(s"files: ${snap.numFiles}") { snap.numFiles should be > 3 }
    // tight disjoint ranges: a point lookup reads one file
    val kept = Pruner.prune(snap.files, Seq(col("id") === 123L), snap.schema)
    kept.size shouldBe 1
    t.read(Seq(col("id") === 123L)).count() shouldBe 1
    t.read().count() shouldBe 60000
    // a second clustered append stays prunable (2 appends -> <= 2 files/point)
    t.append(spark.createDataset(rows.map(_ + 100000L)).toDF("id")
      .withColumn("v", lit("x")))
    val snap2 = t.snapshot()
    Pruner.prune(snap2.files, Seq(col("id") === 123L), snap2.schema)
      .size shouldBe 1
  }

  test("ALTER TABLE CLUSTER BY DDL sets and clears the clustering columns") {
    val t = LakeTable.create(spark, tmpDir("clusterby-ddl").resolve("t").toString,
      StructType(Seq(StructField("id", LongType))))
    val sql = GraftSql(spark)
    sql.run(s"ALTER TABLE '${t.dir}' CLUSTER BY (id)")
    t.properties("graft.clusterBy") shouldBe "id"
    sql.run(s"ALTER TABLE '${t.dir}' CLUSTER BY NONE")
    t.properties("graft.clusterBy") shouldBe ""
  }
}
